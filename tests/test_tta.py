"""TTA inference path: shared proposals, score-sum/box-mean over variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unit_tpu.models import WSRCNN
from tests.test_model_smoke import tiny_config, model_and_vars  # noqa: F401


@pytest.mark.slow
def test_predict_tta_runs_and_matches_single_variant(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[64, 64]], jnp.float32)

    # one identity variant (scale 1, no flip): probs are softmax-summed over one
    # variant = plain softmax, so detections should match predict() closely
    variants = [{"image": img, "image_size": sizes, "scale": 1.0, "flip": False}]
    det_tta = model.apply(
        variables, img, sizes, variants, method=WSRCNN.predict_tta
    )
    det = model.apply(variables, img, sizes, method=WSRCNN.predict)
    v1 = np.asarray(det_tta.valid)
    v2 = np.asarray(det.valid)
    assert v1.sum() == v2.sum()
    if v1.any():
        np.testing.assert_allclose(
            np.asarray(det_tta.boxes)[v1], np.asarray(det.boxes)[v2], atol=1.0
        )


@pytest.mark.slow
def test_predict_tta_grouped_pass_matches_sequential(model_and_vars):
    """Same-shape variants run as ONE batched pass (flip-pair batching); two
    identical no-flip variants must produce exactly doubled summed probs and
    identical averaged deltas vs the single-variant run — pinning that the
    grouped path computes per-variant results equal to the sequential loop."""
    model, variables = model_and_vars
    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[64, 64]], jnp.float32)

    one = [{"image": img, "image_size": sizes, "scale": 1.0, "flip": False}]
    two = one + [dict(one[0])]
    det1 = model.apply(variables, img, sizes, one, method=WSRCNN.predict_tta)
    det2 = model.apply(variables, img, sizes, two, method=WSRCNN.predict_tta)
    v1, v2 = np.asarray(det1.valid), np.asarray(det2.valid)
    # doubling all class scores preserves the NMS ranking; with the default
    # score threshold detections can only be added, never removed
    assert v2.sum() >= v1.sum()
    n = int(min(v1.sum(), v2.sum()))
    if n:
        b1 = np.asarray(det1.boxes)[v1][:n]
        b2 = np.asarray(det2.boxes)[v2][:n]
        np.testing.assert_allclose(b1, b2, atol=1e-3)
        s1 = np.asarray(det1.scores)[v1][:n]
        s2 = np.asarray(det2.scores)[v2][:n]
        np.testing.assert_allclose(2.0 * s1, s2, rtol=1e-4)


@pytest.mark.slow
def test_predict_tta_with_precomputed_proposals(model_and_vars):
    """PrecomputedProposals under TTA (rcnn.py:47-83: the reference transforms
    proposal boxes into every augmented frame): with boxes supplied, the RPN is
    skipped and an identity variant must reproduce predict(proposal_boxes)."""
    model, variables = model_and_vars
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    pb = jnp.asarray(
        [[[2.0, 2.0, 30.0, 40.0], [10.0, 5.0, 60.0, 60.0],
          [0.0, 0.0, 63.0, 63.0], [20.0, 20.0, 44.0, 52.0]]], jnp.float32
    )
    pv = jnp.ones((1, 4), bool)

    variants = [{"image": img, "image_size": sizes, "scale": 1.0, "flip": False}]
    det_tta = model.apply(
        variables, img, sizes, variants,
        proposal_boxes=pb, proposal_valid=pv, method=WSRCNN.predict_tta,
    )
    det = model.apply(
        variables, img, sizes, proposal_boxes=pb, proposal_valid=pv,
        method=WSRCNN.predict,
    )
    v1, v2 = np.asarray(det_tta.valid), np.asarray(det.valid)
    assert v1.sum() == v2.sum()
    if v1.any():
        np.testing.assert_allclose(
            np.asarray(det_tta.boxes)[v1], np.asarray(det.boxes)[v2], atol=1.0
        )

    # flip + scale variants on the same proposals stay finite
    flipped = jnp.asarray(np.asarray(img)[:, :, ::-1].copy())
    variants = [
        {"image": img, "image_size": sizes, "scale": 1.0, "flip": False},
        {"image": flipped, "image_size": sizes, "scale": 1.0, "flip": True},
    ]
    det_f = model.apply(
        variables, img, sizes, variants,
        proposal_boxes=pb, proposal_valid=pv, method=WSRCNN.predict_tta,
    )
    assert np.isfinite(np.asarray(det_f.boxes)).all()


@pytest.mark.slow
def test_predict_tta_flip_variant(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.RandomState(8)
    img = np.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[64, 64]], jnp.float32)
    flipped = img[:, :, ::-1].copy()
    variants = [
        {"image": jnp.asarray(img), "image_size": sizes, "scale": 1.0, "flip": False},
        {"image": jnp.asarray(flipped), "image_size": sizes, "scale": 1.0, "flip": True},
    ]
    det = model.apply(
        variables, jnp.asarray(img), sizes, variants, method=WSRCNN.predict_tta
    )
    assert np.isfinite(np.asarray(det.boxes)).all()
    assert np.isfinite(np.asarray(det.scores)).all()


@pytest.mark.slow
def test_tta_tight_canvas_matches_wide(model_and_vars):
    """Round-5 TTA lever: tight vs wide variant canvases.

    NOT bit-identical: canvas pixels are zeros, which preprocess maps to
    -mean/std, and the canvas edge's conv halo (zeros past the edge) sits at
    a different distance from the content — inside res4's receptive field.
    The REFERENCE pads each TTA variant only to divisibility 32 (d2
    ImageList at batch 1), i.e. its geometry IS the tight canvas; the wide
    canvas (pre-round-5) was the approximation.  This test bounds the
    tight-vs-wide drift to sub-pixel box and small score deltas."""
    model, variables = model_and_vars
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[64, 64]], jnp.float32)

    content = rng.rand(48, 48, 3).astype(np.float32) * 255
    tight = np.zeros((1, 48, 64, 3), np.float32)
    tight[0, :48, :48] = content
    wide = np.zeros((1, 48, 128, 3), np.float32)
    wide[0, :48, :48] = content
    vsz = jnp.asarray([[48, 48]], jnp.float32)

    det_t = model.apply(
        variables, img, sizes,
        [{"image": jnp.asarray(tight), "image_size": vsz, "scale": 0.75,
          "flip": False}],
        method=WSRCNN.predict_tta,
    )
    det_w = model.apply(
        variables, img, sizes,
        [{"image": jnp.asarray(wide), "image_size": vsz, "scale": 0.75,
          "flip": False}],
        method=WSRCNN.predict_tta,
    )
    vt, vw = np.asarray(det_t.valid), np.asarray(det_w.valid)
    assert vt.sum() == vw.sum()
    if vt.any():
        np.testing.assert_allclose(
            np.asarray(det_t.boxes)[vt], np.asarray(det_w.boxes)[vw], atol=0.5
        )
        np.testing.assert_allclose(
            np.asarray(det_t.scores)[vt], np.asarray(det_w.scores)[vw], atol=0.02
        )
