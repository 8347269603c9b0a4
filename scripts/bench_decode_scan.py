"""Decode throughput scan on the real chip: beam-5 batch peak + greedy.

Two questions this answers after the head+top-k kernel landed (PERF.md
round 3):

1. Where is the beam-5 batch peak for the head-kernel path?  bench.py
   decodes at the scanned peak; this re-scans 320..416 (>=448 risks
   crashing the axon TPU worker — "Axon quirks" in PERF.md).
2. Does the fused head kernel also win at beam=1 (greedy)?  The round-2
   greedy number (12,455 captions/s at batch 256) predates the kernel.

Usage: python scripts/bench_decode_scan.py [--beams 5,1] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure(decode, params, batch, iters):
    for _ in range(2):
        np.asarray(decode(params, batch=batch)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        outs, _ = decode(params, batch=batch)
    np.asarray(outs)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beams", default="5,1")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", default="")
    ap.add_argument("--blocks", default="",
                    help="also scan row-blocked head-kernel variants with "
                         "these block sizes (ops/head_topk.py block_rows)")
    args = ap.parse_args()

    import bench
    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search

    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
    config = _model_config(bench.D_MODEL, bench.HEADS, bench.LAYERS,
                           bench.D_FF, bench.D_FEATURE)
    model = build_model(config, vocab)

    for beam in [int(b) for b in args.beams.split(",")]:
        if args.batches:
            batches = [int(b) for b in args.batches.split(",")]
        elif beam == 5:
            batches = [320, 352, 384, 416]
        else:
            batches = [256, 384, 512, 768]
        for bs in batches:
            batch = _make_batch(vocab, bs=bs, n_regions=bench.N_REGIONS,
                                d_feature=bench.D_FEATURE)
            batch = {"region_features": batch["region_features"]}
            params = model.init(
                jax.random.PRNGKey(0),
                dict(batch,
                     caption_tokens=np.zeros((bs, bench.MAX_LEN), np.int32)),
            )
            variants = [
                ("xla ", dict(beam_resident=True)),
                ("head", dict(head_kernel=True)),
            ]
            if args.blocks:
                variants += [
                    (f"hb{nb:<4d}", dict(head_kernel=nb))
                    for nb in (int(b) for b in args.blocks.split(","))
                ]
            for name, kw in variants:
                decode = jax.jit(functools.partial(
                    beam_search, model, beam_size=beam, out_size=1,
                    compute_dtype=jnp.bfloat16, **kw,
                ))
                try:
                    dt = measure(decode, params, batch, args.iters)
                    print(f"beam {beam} bs {bs:4d} {name}: "
                          f"{dt*1e3:7.1f} ms/batch  {bs/dt:8.0f} captions/s",
                          flush=True)
                except Exception as e:
                    print(f"beam {beam} bs {bs:4d} {name}: FAILED "
                          f"{type(e).__name__}: {str(e).splitlines()[0][:120]}",
                          flush=True)
            del batch, params


if __name__ == "__main__":
    main()
