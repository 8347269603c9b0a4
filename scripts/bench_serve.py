"""Serving-throughput benchmark at reference scale (run on TPU).

Fabricates a reference-scale checkpoint (random weights — serving
throughput is weight-independent), starts the HTTP caption server with
its cross-request micro-batcher, and hammers /caption_features with
concurrent clients.  Reports requests/s and per-request latency
percentiles.  The reference has no serving layer at all (its CLI only
runs test-set evaluation, reference train.py:17), so the comparison row
is the repo's own offline decode throughput (bench.py).
"""

from __future__ import annotations

import io
import json
import os
import pickle
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _model_config
from openviic_tpu.config import ConfigNode
from openviic_tpu.server import CaptionServer
from openviic_tpu.serving import CaptioningPipeline

VOCAB, MAX_LEN, D, H, L, FF, DF = 10_000, 25, 512, 8, 3, 2048, 1024
BEAM = 3  # the reference's EVALUATING_BEAM_SIZE
N_REGIONS = 50
CLIENTS = int(os.environ.get("BENCH_CLIENTS", 32))
REQUESTS_PER_CLIENT = int(os.environ.get("BENCH_REQS", 8))
SERVER_BATCH = int(os.environ.get("BENCH_BATCH", 32))
MAX_WAIT_MS = float(os.environ.get("BENCH_WAIT_MS", 25.0))


class BenchVocab:
    """Picklable vocab stand-in (vocab.bin is unpickled in-process)."""

    def __init__(self, size: int, max_len: int):
        self.itos = ["<pad>", "<bos>", "<eos>", "<unk>"] + [
            f"w{i}" for i in range(size - 4)
        ]
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        self.padding_idx, self.bos_idx, self.eos_idx, self.unk_idx = 0, 1, 2, 3
        self.max_caption_length = max_len
        self.word_embeddings = None
        self.specials = self.itos[:4]

    def __len__(self):
        return len(self.itos)

    def decode_caption(self, rows, join_words=True):
        caps = []
        for row in np.atleast_2d(rows):
            toks = []
            for idx in row:
                if idx == self.eos_idx:
                    break
                if idx > 3:
                    toks.append(self.itos[int(idx)])
            caps.append(" ".join(toks) if join_words else toks)
        return caps


def make_checkpoint_dir(tmp) -> ConfigNode:
    import jax

    from openviic_tpu.builders import build_model
    from openviic_tpu.training import checkpoint as ckpt

    vocab = BenchVocab(size=VOCAB, max_len=MAX_LEN)
    model_cfg = _model_config(D, H, L, FF, DF)
    config = ConfigNode(
        {
            "TRAINING": {
                "CHECKPOINT_PATH": tmp,
                "EVALUATING_BEAM_SIZE": BEAM,
            },
            "MODEL": model_cfg.to_dict(),
        }
    )
    run_dir = os.path.join(tmp, config.MODEL.NAME)
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "vocab.bin"), "wb") as f:
        pickle.dump(vocab, f)

    model = build_model(config.MODEL, vocab)
    batch = {
        "region_features": np.zeros((1, 8, DF), np.float32),
        "caption_tokens": np.zeros((1, MAX_LEN), np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    ckpt.save_checkpoint(
        os.path.join(run_dir, ckpt.BEST_NAME),
        {
            "params": params,
            "opt_state": None,
            "step": 0,
            "rng": jax.random.PRNGKey(0),
        },
        {"epoch": 0},
    )
    return config


def _feature_payload(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = {
        "region_features": rng.normal(size=(N_REGIONS, DF)).astype(np.float32)
    }
    buf = io.BytesIO()
    np.savez(buf, **payload)
    return buf.getvalue()


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        config = make_checkpoint_dir(tmp)
        pipeline = CaptioningPipeline(
            config, beam_size=BEAM, batch_size=SERVER_BATCH
        )
        server = CaptionServer(
            pipeline, port=0, max_batch=SERVER_BATCH, max_wait_ms=MAX_WAIT_MS
        )
        server.start()
        port = server.port
        url = f"http://127.0.0.1:{port}/caption_features"

        def post(body: bytes) -> dict:
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=600) as resp:
                return json.loads(resp.read())

        # warm up: compile the (batch, bucket) programs
        post(_feature_payload(0))
        threads = [
            threading.Thread(target=post, args=(_feature_payload(i),))
            for i in range(SERVER_BATCH)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        latencies: list = []
        lock = threading.Lock()

        def client(cid: int) -> None:
            for r in range(REQUESTS_PER_CLIENT):
                body = _feature_payload(cid * 1000 + r)
                t0 = time.perf_counter()
                post(body)
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)

        t0 = time.perf_counter()
        workers = [
            threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)
        ]
        for w in workers:
            w.start()
        for w in workers:
            w.join()
        wall = time.perf_counter() - t0
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        server.stop()

    lat = np.asarray(sorted(latencies))
    n = len(lat)
    print(
        json.dumps(
            {
                "requests": n,
                "concurrent_clients": CLIENTS,
                "server_batch": SERVER_BATCH,
                "beam": BEAM,
                "max_wait_ms": MAX_WAIT_MS,
                "requests_per_sec": round(n / wall, 1),
                "p50_ms": round(float(lat[n // 2]) * 1e3, 1),
                "p99_ms": round(float(lat[int(n * 0.99)]) * 1e3, 1),
                "batcher": health.get("batcher"),
            }
        )
    )


if __name__ == "__main__":
    main()
