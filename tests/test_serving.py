"""Serving subsystem: DetectionService, StableHLO export roundtrip, HTTP server."""

import json
import urllib.request

import numpy as np
import pytest

from unit_tpu.config import get_cfg
from tests.test_model_smoke import tiny_config, model_and_vars  # noqa: F401


def _serving_cfg():
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.MAX_GT_BOXES = 10
    return cfg


def _png_bytes(arr_rgb):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_rgb.astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.slow
def test_detection_service_array_and_bytes(model_and_vars):
    from unit_tpu.serving import DetectionService

    model, variables = model_and_vars
    svc = DetectionService(
        _serving_cfg(), model=model, params=variables["params"],
        class_names=[f"c{i}" for i in range(20)],
    )
    rng = np.random.RandomState(0)
    img = rng.rand(80, 100, 3).astype(np.float32) * 255  # landscape
    dets = svc.detect_array(img)
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) >= {"box", "score", "class_id", "class_name"}
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= x2 <= 100 and 0 <= y1 <= y2 <= 80

    # encoded path decodes to the same original frame (portrait this time,
    # exercising the transposed canvas)
    dets_p = svc.detect_bytes(_png_bytes(rng.rand(100, 60, 3) * 255))
    for d in dets_p:
        x1, y1, x2, y2 = d["box"]
        assert 0 <= x1 <= x2 <= 60 and 0 <= y1 <= y2 <= 100


@pytest.mark.slow
def test_export_roundtrip_matches_live_predict(model_and_vars, tmp_path):
    """The serialized StableHLO artifact must reproduce the live jitted
    predict bit-for-bit on the same canvas input (weights are baked in)."""
    import jax
    import jax.numpy as jnp

    from unit_tpu.serving import export_predict, load_exported
    from unit_tpu.serving.export import make_flat_predict

    model, variables = model_and_vars
    cfg = _serving_cfg()
    path = str(tmp_path / "model.stablehlo.pkl")
    meta = export_predict(cfg, model, variables["params"], path)
    assert meta["with_proposals"] is False
    assert len(meta["canvases"]) == 2  # both orientations

    exported = load_exported(path)
    rng = np.random.RandomState(1)
    key = meta["canvases"][0]
    ch, cw = (int(v) for v in key.split("x"))
    img = jnp.asarray(rng.rand(1, ch, cw, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[ch, cw]], jnp.float32)

    # the exact program that was serialized (same baked-params closure):
    # the roundtrip must reproduce it bit-for-bit
    live = jax.jit(make_flat_predict(model, variables["params"]))(img, sizes)
    det_exp = exported(img, sizes)
    np.testing.assert_array_equal(
        np.asarray(live["valid"]), np.asarray(det_exp.valid))
    v = np.asarray(live["valid"])
    np.testing.assert_allclose(
        np.asarray(live["boxes"])[v], np.asarray(det_exp.boxes)[v],
        rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(live["scores"])[v], np.asarray(det_exp.scores)[v],
        rtol=1e-6, atol=1e-6)

    # unknown canvas -> clear error
    bad = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="no exported program"):
        exported(bad, jnp.asarray([[32, 32]], jnp.float32))


@pytest.mark.slow
def test_microbatch_matches_single(model_and_vars):
    """batch_size=4 micro-batched results == batch_size=1 results per image
    (per-image independence of the batched predict path), including when the
    group is padded and when orientations are mixed."""
    from unit_tpu.serving import DetectionService
    from unit_tpu.serving.server import _MicroBatcher

    model, variables = model_and_vars
    cfg = _serving_cfg()
    names = [f"c{i}" for i in range(20)]
    single = DetectionService(cfg, model=model, params=variables["params"],
                              class_names=names)
    calls = []
    batched = DetectionService(cfg, model=model, params=variables["params"],
                               class_names=names, batch_size=4,
                               batch_wait_ms=60.0)
    assert isinstance(batched._batcher, _MicroBatcher)
    inner = batched._batcher._predict
    batched._batcher._predict = lambda i, s: (calls.append(i.shape[0]), inner(i, s))[1]

    rng = np.random.RandomState(3)
    imgs = [rng.rand(80, 100, 3).astype(np.float32) * 255 for _ in range(3)]
    imgs.append(rng.rand(100, 60, 3).astype(np.float32) * 255)  # portrait

    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(4) as pool:
        got = list(pool.map(batched.detect_array, imgs))
    want = [single.detect_array(im) for im in imgs]
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for dg, dw in zip(g, w):
            assert dg["class_id"] == dw["class_id"]
            # batch-4 vs batch-1 programs fuse differently: ~1e-3 px drift
            np.testing.assert_allclose(dg["box"], dw["box"], rtol=1e-4, atol=1e-2)
            np.testing.assert_allclose(dg["score"], dw["score"],
                                       rtol=1e-3, atol=1e-4)
    # every device call was padded to a power-of-two batch; grouping happened
    # (4 images cannot have taken 4 calls: the 3 same-orientation requests
    # arrived within the 60 ms window)
    assert all(c in (1, 2, 4) for c in calls)
    assert len(calls) < 4
    batched.close()
    assert batched._batcher is None


@pytest.mark.slow
def test_batched_export_roundtrip(model_and_vars, tmp_path):
    """An artifact exported at batch_size=2 serves through the micro-batcher
    and matches the live single-image service."""
    from unit_tpu.serving import DetectionService, export_predict, load_exported

    model, variables = model_and_vars
    cfg = _serving_cfg()
    path = str(tmp_path / "model_b2.stablehlo.pkl")
    meta = export_predict(cfg, model, variables["params"], path, batch_size=2)
    assert meta["batch_size"] == 2

    svc = DetectionService(cfg, exported=load_exported(path))
    assert svc.batch_size == 2  # picked up from the artifact
    single = DetectionService(cfg, model=model, params=variables["params"])
    img = np.random.RandomState(5).rand(80, 100, 3).astype(np.float32) * 255
    got, want = svc.detect_array(img), single.detect_array(img)
    assert len(got) == len(want)
    for dg, dw in zip(got, want):
        assert dg["class_id"] == dw["class_id"]
        np.testing.assert_allclose(dg["box"], dw["box"], rtol=1e-4, atol=1e-2)
    svc.close()


@pytest.mark.slow
def test_detect_bytes_native_jpeg_path(model_and_vars, monkeypatch):
    """JPEG requests take the C in-memory decode path and agree with the PIL
    fallback (decoders may differ by +-1 LSB per pixel -> loose box tol)."""
    import io

    from PIL import Image

    from unit_tpu.data import native
    from unit_tpu.serving import DetectionService

    if not (native.available() and hasattr(native.load_library(), "prepare_image_mem")):
        pytest.skip("native library not built")

    model, variables = model_and_vars
    svc = DetectionService(_serving_cfg(), model=model, params=variables["params"])
    rng = np.random.RandomState(7)
    payloads = []
    for shape in ((90, 120, 3), (120, 70, 3)):  # landscape + portrait
        buf = io.BytesIO()
        Image.fromarray((rng.rand(*shape) * 255).astype(np.uint8)).save(
            buf, format="JPEG", quality=95)
        payloads.append(buf.getvalue())

    native_calls = []
    orig = native.prepare_image_mem_native
    monkeypatch.setattr(
        native, "prepare_image_mem_native",
        lambda *a, **k: (native_calls.append(1), orig(*a, **k))[1],
    )
    got = [svc.detect_bytes(p) for p in payloads]
    assert len(native_calls) == 2  # both requests went through C

    monkeypatch.setattr(native, "available", lambda: False)
    want = [svc.detect_bytes(p) for p in payloads]
    for g, w, shape in zip(got, want, ((90, 120), (120, 70))):
        assert len(g) == len(w)
        for dg, dw in zip(g, w):
            assert dg["class_id"] == dw["class_id"]
            np.testing.assert_allclose(dg["box"], dw["box"], atol=1.5)
        for d in g:  # boxes in the ORIGINAL client frame
            x1, y1, x2, y2 = d["box"]
            assert 0 <= x1 <= x2 <= shape[1] and 0 <= y1 <= y2 <= shape[0]


@pytest.mark.slow
def test_detect_bytes_device_error_propagates(model_and_vars, monkeypatch):
    """A device-side RuntimeError (XlaRuntimeError subclasses it) raised during
    prediction on the native JPEG path must propagate to the caller — NOT be
    swallowed by the corrupt-JPEG fallback and silently re-run through PIL."""
    import io

    from PIL import Image

    from unit_tpu.data import native
    from unit_tpu.serving import DetectionService

    if not (native.available() and hasattr(native.load_library(), "prepare_image_mem")):
        pytest.skip("native library not built")

    model, variables = model_and_vars
    svc = DetectionService(_serving_cfg(), model=model, params=variables["params"])
    buf = io.BytesIO()
    Image.fromarray(
        (np.random.RandomState(3).rand(90, 120, 3) * 255).astype(np.uint8)
    ).save(buf, format="JPEG", quality=95)

    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("simulated device failure")

    monkeypatch.setattr(svc, "_predict", boom)
    with pytest.raises(RuntimeError, match="simulated device failure"):
        svc.detect_bytes(buf.getvalue())
    assert len(calls) == 1  # no second (PIL-path) inference attempt


@pytest.mark.slow
def test_http_server_end_to_end(model_and_vars):
    from unit_tpu.serving import DetectionServer, DetectionService

    model, variables = model_and_vars
    svc = DetectionService(_serving_cfg(), model=model, params=variables["params"])
    server = DetectionServer(
        svc, host="127.0.0.1", port=0, metadata={"flavor": "test"}
    ).start_background()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(base + "/metadata", timeout=30) as r:
            assert json.load(r)["flavor"] == "test"

        rng = np.random.RandomState(2)
        payload = _png_bytes(rng.rand(72, 96, 3) * 255)
        req = urllib.request.Request(base + "/predict", data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.load(r)
        assert "detections" in body
        for d in body["detections"]:
            assert {"box", "score", "class_id"} <= set(d)

        # malformed input -> 400, not a crash
        req = urllib.request.Request(
            base + "/predict", data=b"not an image", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_with_proposals_artifact_rejected():
    """A dock-style (precomputed-proposal) artifact takes 4 inputs the HTTP
    path cannot supply — the service must refuse it up front, not crash on
    the first request."""
    import types

    from unit_tpu.serving import DetectionService

    exported = types.SimpleNamespace(meta={"with_proposals": True})
    with pytest.raises(ValueError, match="with_proposals"):
        DetectionService(_serving_cfg(), exported=exported)


def test_microbatcher_close_fails_stranded_requests():
    """A request that lands behind the stop sentinel must be failed with an
    error, not left blocking its submit() caller forever."""
    import threading

    from unit_tpu.serving.server import _MicroBatcher, _STOP

    mb = _MicroBatcher(lambda img, sz: None, batch_size=2, wait_ms=1.0)
    # stop the dispatcher, then strand a request behind the sentinel
    mb._q.put(_STOP)
    mb._thread.join(timeout=5)
    item = {
        "image": np.zeros((4, 4, 3), np.float32),
        "size": np.ones(2, np.float32),
        "event": threading.Event(),
    }
    mb._q.put(item)
    mb.close()
    assert item["event"].is_set()
    assert isinstance(item.get("error"), RuntimeError)
