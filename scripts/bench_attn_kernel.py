"""Standalone on-chip check + micro-bench of ops/beam_select_attention.py.

Compares the fused beam-select attention kernel against the XLA einsum
path (attend_projected_beam_select's math) at bench decode shapes, then
times both.  Usage: python scripts/bench_attn_kernel.py [bs] [block_images]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from openviic_tpu.ops.beam_select_attention import beam_select_attention


def xla_ref(q_t, k, v, ancestry, position_mask, mask_axis="p"):
    b_s, n_beams, L = ancestry.shape
    h, d_k = q_t.shape[2], q_t.shape[3]
    d_v = v.shape[3]
    qb = q_t.reshape(b_s, n_beams, h, d_k)
    kb = k.reshape(b_s, n_beams, L, h, d_k)
    vb = v.reshape(b_s, n_beams, L, h, d_v)
    att = jnp.einsum(
        "bqhd,bpLhd->bqpLh", qb, kb, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    onehot = (
        ancestry[:, :, None, :]
        == jnp.arange(n_beams, dtype=ancestry.dtype)[None, None, :, None]
    )
    if mask_axis == "p":
        not_masked = ~position_mask.reshape(b_s, 1, n_beams, L)
    else:
        not_masked = ~position_mask.reshape(b_s, n_beams, 1, L)
    live = jnp.logical_and(onehot, not_masked)
    att = jnp.where(live[..., None], att, -jnp.inf)
    att = jax.nn.softmax(att.reshape(b_s, n_beams, n_beams * L, h), axis=2)
    att = att.reshape(b_s, n_beams, n_beams, L, h)
    out = jnp.einsum(
        "bqpLh,bpLhd->bqhd", att, vb, preferred_element_type=jnp.float32
    ).astype(q_t.dtype)
    return out.reshape(b_s * n_beams, 1, h, d_v)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    block = int(sys.argv[2]) if len(sys.argv) > 2 else None
    beam, L, h, d = 5, 25, 8, 64
    N = bs * beam
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q_t = jnp.asarray(rng.normal(size=(N, 1, h, d)), dt)
    k = jnp.asarray(rng.normal(size=(N, L, h, d)), dt)
    v = jnp.asarray(rng.normal(size=(N, L, h, d)), dt)
    anc = jnp.asarray(rng.integers(0, beam, size=(bs, beam, L)), jnp.int32)
    pm = rng.random((N, L)) < 0.3
    pm[:, 0] = False
    pm = jnp.asarray(pm).reshape(N, 1, 1, L)

    fker = jax.jit(
        lambda *a: beam_select_attention(*a, mask_axis="p", block_images=block)
    )
    fref = jax.jit(lambda *a: xla_ref(*a, mask_axis="p"))

    got = np.asarray(fker(q_t, k, v, anc, pm), np.float32)
    ref = np.asarray(fref(q_t, k, v, anc, pm), np.float32)
    err = np.abs(got - ref).max()
    print(f"backend={jax.default_backend()} bs={bs} max|diff|={err:.3e}")
    assert err < 2e-2, "kernel diverges from XLA path"

    for name, f in (("kernel", fker), ("xla", fref)):
        np.asarray(f(q_t, k, v, anc, pm))  # warm
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            o = f(q_t, k, v, anc, pm)
        np.asarray(o)
        dt_us = (time.perf_counter() - t0) / iters * 1e6
        print(f"  {name:8s} {dt_us:8.1f} us/call (one layer-step)")


if __name__ == "__main__":
    main()
