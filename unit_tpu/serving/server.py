"""Minimal production inference service over the jitted/exported predict path.

The reference stops at training/eval CLIs; deployment means hand-rolling a
Detectron2 predictor loop.  This module gives unit_tpu a first-class serving
surface with no dependencies beyond the stdlib:

- ``DetectionService``: image bytes/array -> detections in original-image
  coordinates, using the SAME test-time transform as evaluation (resize
  shortest edge, orientation-bucketed fixed canvas) so served results match
  ``--eval-only`` outputs exactly, and the fixed shapes hit one compiled
  program per orientation.
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
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np


class DetectionService:
    """Shared-state detector: prep -> predict -> original-frame detections."""

    def __init__(
        self,
        cfg,
        model=None,
        params=None,
        exported=None,
        class_names: Optional[Sequence[str]] = None,
    ):
        from ..data.transforms import TransformConfig

        if exported is None and (model is None or params is None):
            raise ValueError("need either exported= or model= and params=")
        self.tcfg = TransformConfig.test_from_cfg(cfg)
        self.class_names = list(class_names) if class_names else None
        self.score_thresh = float(cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST)
        self._rng = np.random.RandomState(0)
        self._lock = threading.Lock()  # transform rng + jax dispatch ordering
        if exported is not None:
            self._predict = exported
            if exported.meta.get("class_names") and not self.class_names:
                self.class_names = exported.meta["class_names"]
        else:
            from ..engine.train import make_predict_fn

            fn = make_predict_fn(model)
            self._predict = lambda img, sz: fn(params, img, sz)

    # -- input adapters ----------------------------------------------------
    def detect_bytes(self, data: bytes):
        """Decode an encoded image (JPEG/PNG/...) and run detection."""
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
            det = self._predict(
                s["image"][None],
                np.asarray(s["image_size"], np.float32)[None],
            )
            boxes, scores, classes, valid = [
                np.asarray(x[0]) for x in (det.boxes, det.scores, det.classes, det.valid)
            ]
        boxes = boxes / s["scale"]
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
        out = []
        for i in np.flatnonzero(valid):
            cid = int(classes[i])
            rec = {
                "box": [float(v) for v in boxes[i]],
                "score": float(scores[i]),
                "class_id": cid,
            }
            if self.class_names and 0 <= cid < len(self.class_names):
                rec["class_name"] = self.class_names[cid]
            out.append(rec)
        out.sort(key=lambda r: -r["score"])
        return out

    def warmup(self):
        """Compile every orientation once so the first request is fast."""
        ch, cw = self.tcfg.canvas
        for (hh, ww) in {(ch, cw), (cw, ch)}:
            self.detect_array(np.zeros((hh, ww, 3), np.float32))
        return self


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
        if self._thread is not None:
            self._thread.join(timeout=5)
