"""Measure partially-unrolled decode loop bodies on the real chip.

Hypothesis (PERF.md "Remaining gap analysis"): the while_loop body
re-stages ~25 loop-invariant weight buffers every step; running k
consecutive steps per body execution pays that staging once per k steps
and lets XLA software-pipeline across the fused steps.  Early exit
coarsens to k-step granularity (observably identical results).

Usage: python scripts/bench_unroll.py [batch] [--beams 5] [--iters 10]
       [--unrolls 1,5,25] [--head-kernel]
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
    toks = np.asarray(outs)
    return (time.perf_counter() - t0) / iters, toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=320)
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--unrolls", default="1,5,25")
    ap.add_argument("--head-kernel", action="store_true")
    args = ap.parse_args()

    import bench
    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search

    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"batch {args.batch}, beam {args.beams}, "
          f"head_kernel={args.head_kernel}")
    bs = args.batch
    vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
    config = _model_config(bench.D_MODEL, bench.HEADS, bench.LAYERS,
                           bench.D_FF, bench.D_FEATURE)
    model = build_model(config, vocab)
    batch = _make_batch(vocab, bs=bs, n_regions=bench.N_REGIONS,
                        d_feature=bench.D_FEATURE)
    batch = {"region_features": batch["region_features"]}
    params = model.init(
        jax.random.PRNGKey(0),
        dict(batch, caption_tokens=np.zeros((bs, bench.MAX_LEN), np.int32)),
    )

    ref_toks = None
    for k in [int(x) for x in args.unrolls.split(",")]:
        decode = jax.jit(functools.partial(
            beam_search, model, beam_size=args.beams, out_size=1,
            compute_dtype=jnp.bfloat16, beam_resident=True,
            head_kernel=args.head_kernel, unroll=(k if k > 1 else False),
        ))
        try:
            dt, toks = measure(decode, params, batch, args.iters)
        except Exception as e:
            print(f"unroll={k:3d}: FAILED {type(e).__name__}: {e}")
            continue
        if ref_toks is None:
            ref_toks = toks
        agree = float((toks == ref_toks).mean()) * 100
        print(f"unroll={k:3d}: {dt * 1e3:8.2f} ms/batch  "
              f"{bs / dt:8.0f} captions/s  tokens-vs-k1 {agree:.2f}%")


if __name__ == "__main__":
    main()
