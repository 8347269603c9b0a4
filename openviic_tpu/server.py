"""HTTP caption-serving front end with cross-request batching.

The reference has no serving story at all (its CLI only evaluates,
train.py:17).  ``serving.CaptioningPipeline`` is the batch engine; this
module puts a production-shaped HTTP surface on it:

 - ``POST /caption``        body: raw image bytes (any PIL-readable
                            format) -> ``{"caption": "..."}``
 - ``POST /caption_features`` body: ``.npz`` archive of plain arrays
                            (``np.savez(buf, **feature_dict)``) -> caption.
                            Pickled payloads are rejected: the body comes
                            from an untrusted network peer, and unpickling
                            it would be remote code execution.
 - ``GET /healthz``         liveness + model name

Requests are funnelled through a **micro-batching** worker: concurrent
requests are collected for up to ``max_wait_ms`` (or until ``max_batch``)
and decoded as one fixed-shape TPU batch, so p50 latency stays one decode
deep while throughput follows the batched decode rate.  stdlib-only
(ThreadingHTTPServer + futures); no extra dependencies.
"""

from __future__ import annotations

import io
import json
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from openviic_tpu.utils import setup_logger

logger = setup_logger()


class _Batcher:
    """Collects (kind, payload) work items into pipeline-sized batches."""

    def __init__(self, pipeline, max_batch: int, max_wait_ms: float,
                 backbone: str = "patch", grid: int = 7):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.backbone = backbone
        self.grid = grid
        # observability: batch-fill statistics, exposed on /healthz
        # (updated and read under a lock so /healthz never sees a batch
        # counted with its items missing)
        self.stats = {"batches": 0, "items": 0}
        self._stats_lock = threading.Lock()
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, kind: str, payload) -> Future:
        fut: Future = Future()
        self._q.put((kind, payload, fut))
        return fut

    def _drain(self):
        items = [self._q.get()]  # block for the first item
        deadline = None
        while len(items) < self.max_batch:
            try:
                timeout = self.max_wait if deadline is None else deadline
                items.append(self._q.get(timeout=timeout))
                deadline = 0.0  # subsequent gets: only take what's ready
            except queue.Empty:
                break
        return items

    def _feature_dict(self, kind: str, payload):
        if kind == "features":
            # Untrusted HTTP body: never allow_pickle (arbitrary code
            # execution).  The wire format is a .npz archive of plain
            # arrays; np.load returns an NpzFile we rebuild a dict from.
            data = np.load(io.BytesIO(payload), allow_pickle=False)
            if not hasattr(data, "files"):
                raise ValueError(
                    "expected a .npz archive (np.savez of plain arrays); "
                    "bare/pickled .npy payloads are not accepted"
                )
            return {k: np.asarray(data[k], np.float32) for k in data.files}
        # kind == "image": raw bytes -> extraction backbone
        from PIL import Image

        from openviic_tpu.data.extraction import (
            extract_feature_dict,
            grid_boxes,
        )

        image = Image.open(io.BytesIO(payload))
        bb = self._backbone_instance()
        gboxes = grid_boxes(self.grid)
        needs_regions = (
            self.pipeline.config.MODEL.ARCHITECTURE
            != "StandardTransformerUsingGrid"
        )
        return extract_feature_dict(
            image, bb, gboxes, gboxes if needs_regions else None
        )

    def _backbone_instance(self):
        bb = getattr(self, "_bb", None)
        if bb is None:
            from openviic_tpu.data.extraction import make_backbone

            vis = self.pipeline.config.MODEL.VISION_EMBEDDING
            dim = vis.get("D_FEATURE", None) or vis.get("D_GRID_FEATURE")
            bb = self._bb = make_backbone(self.backbone, self.grid, dim)
        return bb

    def _run(self):
        while True:
            items = self._drain()
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["items"] += len(items)
            feature_dicts, futures = [], []
            for kind, payload, fut in items:
                try:
                    feature_dicts.append(self._feature_dict(kind, payload))
                    futures.append(fut)
                except Exception as e:
                    fut.set_exception(e)
            if not futures:
                continue
            try:
                captions = self.pipeline.caption_features(feature_dicts)
                for fut, cap in zip(futures, captions):
                    fut.set_result(cap)
            except Exception as e:
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)


class CaptionServer:
    """ThreadingHTTPServer wrapper; ``serve_forever`` or ``start``/``stop``."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 8080,
                 max_batch: Optional[int] = None, max_wait_ms: float = 10.0,
                 backbone: str = "patch", grid: int = 7):
        self.pipeline = pipeline
        self.batcher = _Batcher(
            pipeline, max_batch or pipeline.batch_size, max_wait_ms,
            backbone=backbone, grid=grid,
        )
        batcher = self.batcher
        model_name = pipeline.config.MODEL.NAME

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through our logger
                logger.debug("http: " + fmt, *args)

            def _reply(self, code: int, obj) -> None:
                body = json.dumps(obj, ensure_ascii=False).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    with batcher._stats_lock:
                        stats = dict(batcher.stats)
                    stats["mean_fill"] = round(
                        stats["items"] / stats["batches"], 2
                    ) if stats["batches"] else None
                    self._reply(
                        200,
                        {"status": "ok", "model": model_name, "batcher": stats},
                    )
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(n)
                if self.path == "/caption":
                    kind = "image"
                elif self.path == "/caption_features":
                    kind = "features"
                else:
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    caption = batcher.submit(kind, payload).result(timeout=120)
                    self._reply(200, {"caption": caption})
                except Exception as e:
                    self._reply(400, {"error": str(e)})

        # raise the accept backlog above http.server's default 5 so a
        # burst of concurrent clients doesn't get connection-refused
        # (observed with 32 simultaneous bench clients); subclassed so the
        # stdlib class is untouched for other servers in this process
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128

        self.httpd = _Server((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        logger.info("caption server listening on :%d", self.port)

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def serve_forever(self) -> None:
        logger.info("caption server listening on :%d", self.port)
        self.httpd.serve_forever()
