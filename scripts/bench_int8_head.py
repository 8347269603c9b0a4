"""Microbench: int8 variants of the decode vocab-head matmul on the TPU.

The vocab head is the largest single matmul on the decode critical path
(PERF.md decode profile): per step it contracts (batch*beam, d_model) @
(d_model, |V|) — at the bench shape (1600, 512) @ (512, 10000) that is
~16.4 GFLOP, nominally MXU-compute-bound.  v5e's MXU runs int8 at 2x the
bf16 rate, so IF the head is really compute-bound, an int8 path could
halve it.  This script measures, on the real chip:

  1. bf16 baseline           x_bf16 @ W_bf16            (the shipped path)
  2. weight-only int8        x_bf16 @ (W_i8 * scale)    (halves W HBM reads;
                             dequant convert on the critical path)
  3. full int8               quantize x rows (absmax) -> i8 @ i8 -> i32,
                             rescale f32                 (2x MXU rate)

plus the max |logit| error and the argmax/top-5 agreement of each variant
vs f32 (the decode consumer is top-k selection, so ranking agreement is
the accuracy metric that matters).

Usage: python scripts/bench_int8_head.py [--batch 1600] [--iters 50]
Writes one human-readable table; PERF.md records the verdict.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1600)  # 320 images x beam 5
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    r = np.random.default_rng(0)
    x = r.normal(size=(args.batch, args.d)).astype(np.float32)
    w = (r.normal(size=(args.d, args.vocab)) * 0.05).astype(np.float32)

    # per-output-channel symmetric weight quantization
    w_scale = np.abs(w).max(axis=0, keepdims=True) / 127.0  # (1, |V|)
    w_i8 = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)

    x_bf = jnp.asarray(x, jnp.bfloat16)
    w_bf = jnp.asarray(w, jnp.bfloat16)
    w_q = jnp.asarray(w_i8)
    w_s = jnp.asarray(w_scale.astype(np.float32))

    @jax.jit
    def head_bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    @jax.jit
    def head_wonly(x, w_q, w_s):
        w = (w_q.astype(jnp.bfloat16)) * w_s.astype(jnp.bfloat16)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    @jax.jit
    def head_int8(x, w_q, w_s):
        # dynamic per-row activation quantization (absmax), int8 x int8
        # MXU dot with i32 accumulation, f32 rescale
        x_f = x.astype(jnp.float32)
        x_scale = jnp.max(jnp.abs(x_f), axis=1, keepdims=True) / 127.0
        x_q = jnp.clip(jnp.round(x_f / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * x_scale * w_s

    variants = {
        "bf16": lambda: head_bf16(x_bf, w_bf),
        "int8-weight-only": lambda: head_wonly(x_bf, w_q, w_s),
        "int8-full": lambda: head_int8(x_bf, w_q, w_s),
    }

    ref = np.asarray(
        jnp.dot(jnp.asarray(x), jnp.asarray(w),
                preferred_element_type=jnp.float32)
    )
    ref_arg = ref.argmax(axis=1)
    ref_top5 = np.argsort(-ref, axis=1)[:, :5]

    flops = 2 * args.batch * args.d * args.vocab
    print(f"head shape ({args.batch},{args.d})@({args.d},{args.vocab}) = "
          f"{flops/1e9:.1f} GFLOP")
    for name, fn in variants.items():
        out = np.asarray(fn())  # compile + correctness sample
        for _ in range(3):
            fn().block_until_ready()
        t0 = time.perf_counter()
        last = None
        for _ in range(args.iters):
            last = fn()
        last.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        err = np.abs(out - ref).max()
        agree = float((out.argmax(axis=1) == ref_arg).mean())
        top5 = np.argsort(-out, axis=1)[:, :5]
        t5 = float((np.sort(top5, 1) == np.sort(ref_top5, 1)).all(1).mean())
        print(
            f"{name:18s} {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TFLOP/s  "
            f"max|dlogit| {err:.4f}  argmax {agree*100:5.1f}%  "
            f"top5-set {t5*100:5.1f}%"
        )


if __name__ == "__main__":
    main()
