import numpy as np
import jax
import jax.numpy as jnp

from unit_tpu.ops import roi_align as R


def _np_roi_align(feat, rois, out, scale, s, aligned=True):
    """Direct NumPy transcription of the ROIAlign(V2) sampling rule."""
    h, w, c = feat.shape
    n = len(rois)
    res = np.zeros((n, out, out, c), np.float32)
    off = 0.5 if aligned else 0.0
    for r in range(n):
        x1 = rois[r, 0] * scale - off
        y1 = rois[r, 1] * scale - off
        x2 = rois[r, 2] * scale - off
        y2 = rois[r, 3] * scale - off
        bh = (y2 - y1) / out
        bw = (x2 - x1) / out
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(c, np.float32)
                for iy in range(s):
                    for ix in range(s):
                        y = y1 + (ph + (iy + 0.5) / s) * bh
                        x = x1 + (pw + (ix + 0.5) / s) * bw
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y = min(max(y, 0.0), h - 1)
                        x = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y - y0, x - x0
                        acc += (
                            feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx
                        )
                res[r, ph, pw] = acc / (s * s)
    return res


def test_roi_align_matches_reference(rng):
    feat = rng.randn(20, 24, 3).astype(np.float32)
    rois = np.asarray(
        [
            [0.0, 0.0, 320.0, 288.0],   # near-full image (16x scale)
            [32.0, 48.0, 120.0, 200.0],
            [100.0, 10.0, 110.0, 30.0],  # small roi
            [-20.0, -20.0, 40.0, 40.0],  # partially out of bounds
        ],
        np.float32,
    )
    want = _np_roi_align(feat, rois, 7, 1 / 16.0, 2)
    got = R.roi_align_xla(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, 2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_roi_align_chunked_equals_unchunked(rng):
    feat = rng.randn(16, 16, 4).astype(np.float32)
    rois = np.abs(rng.randn(10, 4)).astype(np.float32) * 60
    rois[:, 2:] = rois[:, :2] + np.abs(rois[:, 2:]) + 8
    a = R.roi_align_xla(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, 2, chunk_size=4)
    b = R.roi_align_xla(jnp.asarray(feat), jnp.asarray(rois), 7, 1 / 16.0, 2, chunk_size=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_roi_align_differentiable(rng):
    feat = jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))
    rois = jnp.asarray([[4.0, 4.0, 60.0, 60.0]])

    def loss(f):
        return jnp.sum(R.roi_align_xla(f, rois, 4, 1 / 16.0, 2))

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
