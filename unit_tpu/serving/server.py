"""Minimal production inference service over the jitted/exported predict path.

The reference stops at training/eval CLIs; deployment means hand-rolling a
Detectron2 predictor loop.  This module gives unit_tpu a first-class serving
surface with no dependencies beyond the stdlib:

- ``DetectionService``: image bytes/array -> detections in original-image
  coordinates, using the SAME test-time transform as evaluation (resize
  shortest edge, orientation-bucketed fixed canvas) so served results match
  ``--eval-only`` outputs exactly, and the fixed shapes hit one compiled
  program per orientation.
- Dynamic micro-batching (``batch_size > 1``): concurrent requests are
  grouped per canvas orientation into one padded device call.  The measured
  eval-path numbers motivate this (BASELINE.md): batch 4 runs ~1.9x more
  images/sec than batch 1 on a v5e, so a loaded server nearly doubles
  throughput at a few ms of added latency (``batch_wait_ms``).  Batches are
  always padded to the full ``batch_size`` so each orientation compiles
  exactly ONE program.
- ``DetectionServer``: a threaded HTTP front end —
    POST /predict  (body: JPEG/PNG bytes) -> JSON detections
    GET  /healthz  -> {"status": "ok"} once the model is warmed up
    GET  /metadata -> artifact/model metadata
  Requests share the process-wide device: JAX dispatches are serialized per
  device, so a ThreadingHTTPServer gives concurrent host-side decode+resize
  (the eval-path bottleneck, see BASELINE.md) while device work queues.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np

_STOP = object()


class _MicroBatcher:
    """Groups concurrent predict calls into padded fixed-size device batches.

    One daemon dispatcher thread drains a queue: it takes the first pending
    request, waits up to ``wait_ms`` for more requests with the SAME canvas
    shape (portrait and landscape compile different programs), pads the
    group to ``batch_size`` and runs one device call.  A request with a
    different canvas flushes the current group and is requeued.
    """

    def __init__(self, predict: Callable, batch_size: int, wait_ms: float,
                 fixed: bool = False):
        self._predict = predict
        self.batch_size = int(batch_size)
        # fixed=True: the predictor has exactly ONE compiled batch size (an
        # exported artifact) — every group pads to it.  fixed=False (live
        # jit): pad to the nearest power of two so a group of 1 does not pay
        # a full-batch device call.
        self._fixed = bool(fixed)
        self._wait_s = float(wait_ms) / 1e3
        self._q: "queue.Queue" = queue.Queue()
        # Dispatch and fetch are separate threads so group k+1's host
        # stacking + device dispatch overlaps group k's device->host fetch
        # (on a remote-attached chip the fetch round trip is the dominant
        # fixed cost; the batch-1 path gets the same overlap for free from
        # its concurrent client threads).  maxsize=2 bounds in-flight groups.
        self._fetch_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._fetch_thread = threading.Thread(target=self._fetch_loop, daemon=True)
        self._thread.start()
        self._fetch_thread.start()

    def submit(self, image: np.ndarray, size: np.ndarray) -> dict:
        """image [Hc, Wc, 3], size [2] -> dict of per-image output arrays."""
        item = {"image": image, "size": size, "event": threading.Event()}
        self._q.put(item)
        item["event"].wait()
        if "error" in item:
            raise item["error"]
        return item["out"]

    def close(self):
        self._q.put(_STOP)
        self._thread.join(timeout=5)
        self._fetch_q.put(_STOP)
        self._fetch_thread.join(timeout=5)
        # requests still queued (or requeued cross-orientation items that
        # landed behind the stop sentinel) would otherwise block their
        # submit() callers forever — fail them explicitly
        err = RuntimeError("MicroBatcher closed with requests pending")
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not _STOP:
                item["error"] = err
                item["event"].set()

    # -- dispatcher thread -------------------------------------------------
    def _loop(self):
        while True:
            first = self._q.get()
            if first is _STOP:
                return
            group = [first]
            key = first["image"].shape
            deadline = time.monotonic() + self._wait_s
            stop = False
            while len(group) < self.batch_size:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is _STOP:
                    stop = True
                    break
                if item["image"].shape != key:
                    self._q.put(item)  # other orientation: next group
                    break
                group.append(item)
            self._dispatch(group)
            if stop:
                return

    def _dispatch(self, group):
        try:
            n = len(group)
            if self._fixed:
                b = self.batch_size
            else:
                # nearest power-of-two batch, not always the maximum: a group
                # of 1 must not pay a batch-8 device call.  At most
                # log2(batch_size)+1 compiled programs per orientation.
                b = 1
                while b < n:
                    b *= 2
                b = min(b, self.batch_size)
            images = np.zeros((b,) + group[0]["image"].shape, np.float32)
            sizes = np.ones((b, 2), np.float32)
            for i, item in enumerate(group):
                images[i] = item["image"]
                sizes[i] = item["size"]
            # jit dispatch is async: this enqueues device work and returns
            # lazy arrays; the fetch thread pays the device->host round trip
            det = self._predict(images, sizes)
        except Exception as e:  # propagate to every waiter in the group
            for item in group:
                item["error"] = e
                item["event"].set()
            return
        self._fetch_q.put((group, det))

    def _fetch_loop(self):
        while True:
            job = self._fetch_q.get()
            if job is _STOP:
                return
            group, det = job
            try:
                fields = {
                    "boxes": np.asarray(det.boxes),
                    "scores": np.asarray(det.scores),
                    "classes": np.asarray(det.classes),
                    "valid": np.asarray(det.valid),
                }
                if det.masks is not None:
                    fields["masks"] = np.asarray(det.masks)
                for i, item in enumerate(group):
                    item["out"] = {k: v[i] for k, v in fields.items()}
            except Exception as e:
                for item in group:
                    item["error"] = e
            finally:
                for item in group:
                    item["event"].set()


class DetectionService:
    """Shared-state detector: prep -> (micro-batched) predict -> detections."""

    def __init__(
        self,
        cfg,
        model=None,
        params=None,
        exported=None,
        class_names: Optional[Sequence[str]] = None,
        batch_size: int = 1,
        batch_wait_ms: float = 5.0,
    ):
        from ..data.transforms import TransformConfig

        if exported is None and (model is None or params is None):
            raise ValueError("need either exported= or model= and params=")
        self.tcfg = TransformConfig.test_from_cfg(cfg)
        # uint8 request wire (TPU.HOST_TRANSFER_UINT8): quantize the prepared
        # canvas before the host->device submit — 4x fewer bytes on the link
        # that dominates remote-attached serving (BASELINE.md round 5), <=0.5
        # LSB vs the float32 wire.  Default off: served results then match
        # --eval-only bit-exactly.
        self.uint8_wire = bool(getattr(cfg.TPU, "HOST_TRANSFER_UINT8", False))
        self.class_names = list(class_names) if class_names else None
        self.score_thresh = float(cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST)
        self._rng = np.random.RandomState(0)
        self._lock = threading.Lock()  # transform rng + jax dispatch ordering
        if exported is not None:
            if exported.meta.get("with_proposals"):
                # dock-style programs take (image, size, proposals, valid);
                # an HTTP request carries no precomputed proposals to feed
                raise ValueError(
                    "artifact was exported with_proposals=True (precomputed-"
                    "proposal model); DetectionService cannot source per-image "
                    "proposals for arbitrary requests — re-export with "
                    "with_proposals=False (RPN models) or use the eval CLI "
                    "with DATASETS.PROPOSAL_FILES_TEST"
                )
            self._predict = exported
            if exported.meta.get("class_names") and not self.class_names:
                self.class_names = exported.meta["class_names"]
            # an artifact exported at batch N fixes the device batch size
            batch_size = int(exported.meta.get("batch_size", 1) or 1)
        else:
            from ..engine.train import make_predict_fn

            if getattr(cfg.TPU, "FOLD_BN_AT_EVAL", False):
                from ..utils.bn_fold import fold_frozen_bn

                params = fold_frozen_bn(params)
            # Commit the params to the device ONCE: a host-resident (numpy)
            # tree — e.g. fresh from a checkpoint load — would otherwise be
            # re-transferred on EVERY predict call (measured ~6 s/request for
            # R-101 over a 40 MB/s remote-attached link).
            import jax

            params = jax.device_put(params)
            fn = make_predict_fn(model)
            self._predict = lambda img, sz: fn(params, img, sz)
        self.batch_size = int(batch_size)
        self._batcher = (
            _MicroBatcher(self._predict, self.batch_size, batch_wait_ms,
                          fixed=exported is not None)
            if self.batch_size > 1
            else None
        )

    # -- input adapters ----------------------------------------------------
    def detect_bytes(self, data: bytes):
        """Decode an encoded image (JPEG/PNG/...) and run detection.

        JPEG requests decode+resize fully in C with the GIL released
        (native/dataloader.cc prepare_image_mem) when the library is built;
        anything else (or a native failure) falls back to PIL."""
        from ..data import native

        if data[:2] == b"\xff\xd8" and native.available():
            prepared = None
            try:
                h, w = native.decode_image_size_mem_native(data)
                prepared = native.prepare_image_mem_native(
                    data, self.tcfg.min_sizes[0], self.tcfg.max_size,
                    self._canvas_for(h, w),
                )
            except RuntimeError:
                pass  # corrupt JPEG: let PIL produce the error/result
            if prepared is not None:
                # outside the try: a device-side RuntimeError (XlaRuntimeError
                # subclasses it) must propagate, not silently rerun via PIL
                image, (nh, nw), scale, _ = prepared
                return self._detect_prepared(image, (nh, nw), scale, h, w)
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB")
        arr = np.asarray(img, np.float32)[:, :, ::-1]  # model eats BGR, ref d2
        return self.detect_array(arr)

    def detect_array(self, image_bgr: np.ndarray):
        """image [H, W, 3] float BGR (0-255) -> list of detection dicts."""
        from ..data.transforms import prepare_detection_record

        h, w = image_bgr.shape[:2]
        with self._lock:
            s = prepare_detection_record(
                {"image_id": "request"}, self.tcfg, self._rng,
                image=image_bgr, training=False,
            )
        return self._detect_prepared(
            np.asarray(s["image"]), s["image_size"], s["scale"], h, w
        )

    def _canvas_for(self, h: int, w: int):
        from ..data.transforms import oriented_canvas

        return oriented_canvas(h, w, self.tcfg.canvas)

    def _detect_prepared(self, image, image_size, scale, h, w):
        if self.uint8_wire and image.dtype != np.uint8:
            image = np.clip(np.rint(image), 0, 255).astype(np.uint8)
        size = np.asarray(image_size, np.float32)
        if self._batcher is not None:
            out = self._batcher.submit(image, size)
        else:
            with self._lock:
                det = self._predict(image[None], size[None])
            out = {
                "boxes": np.asarray(det.boxes[0]),
                "scores": np.asarray(det.scores[0]),
                "classes": np.asarray(det.classes[0]),
                "valid": np.asarray(det.valid[0]),
            }
        return self._format(out, scale, h, w)

    def _format(self, out: dict, scale: float, h: int, w: int):
        boxes = out["boxes"] / scale
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
        recs = []
        for i in np.flatnonzero(out["valid"]):
            cid = int(out["classes"][i])
            rec = {
                "box": [float(v) for v in boxes[i]],
                "score": float(out["scores"][i]),
                "class_id": cid,
            }
            if self.class_names and 0 <= cid < len(self.class_names):
                rec["class_name"] = self.class_names[cid]
            recs.append(rec)
        recs.sort(key=lambda r: -r["score"])
        return recs

    def warmup(self, orientations: str = "both"):
        """Compile every program a request could hit so no request pays a
        compile stall: both canvas orientations (or just one, when the
        deployment's request stream is known to be single-orientation —
        ``orientations`` in {"both", "landscape", "portrait"}), and — when
        micro-batching — every power-of-two batch size up to batch_size."""
        sizes = [1]
        while self._batcher is not None and sizes[-1] < self.batch_size:
            sizes.append(min(sizes[-1] * 2, self.batch_size))
        wait = None
        if self._batcher is not None:  # let warmup groups fill completely
            wait, self._batcher._wait_s = self._batcher._wait_s, 1.0
        try:
            ch, cw = self.tcfg.canvas
            lo, hi = min(ch, cw), max(ch, cw)
            canvases = {
                "both": {(lo, hi), (hi, lo)},
                "landscape": {(lo, hi)},
                "portrait": {(hi, lo)},
            }[orientations]
            for (hh, ww) in canvases:
                for k in sizes:
                    img = np.zeros((hh, ww, 3), np.float32)
                    if k == 1:
                        self.detect_array(img)
                    else:
                        import concurrent.futures as cf

                        # k concurrent requests force one size-k group
                        with cf.ThreadPoolExecutor(k) as pool:
                            list(pool.map(self.detect_array, [img] * k))
        finally:
            if wait is not None:
                self._batcher._wait_s = wait
        return self

    def close(self):
        if self._batcher is not None:
            self._batcher.close()
            self._batcher = None


def _make_handler(service: DetectionService, metadata: dict):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/metadata":
                self._reply(200, metadata)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                dets = service.detect_bytes(data)
            except Exception as e:  # undecodable input, shape errors, ...
                self._reply(400, {"error": str(e)})
                return
            self._reply(200, {"detections": dets})

        def log_message(self, fmt, *args):  # quiet; the service logs itself
            pass

    return Handler


class DetectionServer:
    """Threaded HTTP server wrapping a DetectionService."""

    def __init__(self, service: DetectionService, host: str = "0.0.0.0",
                 port: int = 8080, metadata: Optional[dict] = None):
        self.service = service
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(service, metadata or {})
        )
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start_background(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.service.close()
        if self._thread is not None:
            self._thread.join(timeout=5)
