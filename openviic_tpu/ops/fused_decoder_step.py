"""Fused decoder-layer decode step as one Pallas kernel.

The beam-search decode step is op-count bound (PERF.md): each decoder
layer contributes ~40 small HLO ops (projections, cache update, two
attentions, FFN, three LayerNorms).  This kernel runs the whole layer step
— self-attention over the KV cache (with in-place cache write at position
t), cross-attention over precomputed encoder K/V, FFN, and the three
post-LN residuals — in a single pallas_call, processing the batch in
row blocks that fit VMEM.

Scope: ScaledDotProductAttention layers without AoA (the decoder hot path
for every shipped config).  Enabled with ``OPENVIIC_FUSED_STEP=1``;
bit-compatible with the unfused path to bf16 tolerance (tested in
interpret mode and against the step decoder).

Head trick: per-head score/value reductions are expressed as matmuls with
a fixed block-diagonal group matrix G (D x h, G[d,h]=1 iff d belongs to
head h), keeping everything on the MXU/VPU without awkward in-kernel
reshapes of the lane dimension.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG = -1e30


def fused_step_enabled() -> bool:
    return os.environ.get("OPENVIIC_FUSED_STEP", "") in ("1", "true")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(x32, scale, bias, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _attend_block(q, kv_k, kv_v, mask_f32, G, sm_scale):
    """Per-row attention: q (B, D), kv (B, S, D), mask_f32 (B, S) 1=masked.

    The mask arrives as f32 because Mosaic only supports minor-dim
    insertion (the [:, :, None] broadcast) for 32-bit types."""
    B, D = q.shape
    S = kv_k.shape[1]
    prod = kv_k * q[:, None, :]  # (B, S, D)
    scores = jax.lax.dot_general(
        prod.reshape(B * S, D), G, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(B, S, -1)  # (B, S, h)
    scores = scores * sm_scale
    scores = scores + mask_f32[:, :, None] * _NEG
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)  # (B, S, h)
    p_expand = jax.lax.dot_general(
        p.reshape(B * S, -1), G.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(B, S, D)
    out = jnp.sum(kv_v.astype(jnp.float32) * p_expand, axis=1)  # (B, D)
    return out


def _kernel(
    t_ref,  # SMEM (1,)
    x_ref,  # (BN, D)
    kc_ref, vc_ref,  # (BN, L, D) aliased in/out
    ck_ref, cv_ref,  # (BN, M, D)
    smask_ref,  # (BN, L) int8 (1 = masked)
    cmask_ref,  # (BN, M) int8
    G_ref,  # (D, h) f32
    wqkv_ref, bqkv_ref,  # (D, 3D), (1, 3D)
    wo_ref, bo_ref,  # (D, D), (1, D)
    ln1s_ref, ln1b_ref,  # (1, D)
    wqc_ref, bqc_ref,
    woc_ref, boc_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref,  # (D, F), (1, F)
    w2_ref, b2_ref,  # (F, D), (1, D)
    ln3s_ref, ln3b_ref,
    y_ref,  # (BN, D) out
    kco_ref, vco_ref,  # aliased outs
    *, d_k: int, n_heads: int,
):
    t = t_ref[0]
    x = x_ref[:].astype(jnp.float32)  # (BN, D)
    BN, D = x.shape

    # qkv projection (one matmul)
    qkv = (
        jax.lax.dot_general(
            x, wqkv_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[0][None, :]
    )
    q = qkv[:, :D]
    k_new = qkv[:, D : 2 * D]
    v_new = qkv[:, 2 * D :]

    # write this step's K/V into the cache at position t.  Mosaic cannot
    # store at a dynamic sublane index, so the update is a masked select
    # over the whole (small) cache block.
    row = jax.lax.broadcasted_iota(jnp.int32, kc_ref.shape, 1)
    kc = jnp.where(row == t, k_new[:, None, :], kc_ref[:].astype(jnp.float32))
    vc = jnp.where(row == t, v_new[:, None, :], vc_ref[:].astype(jnp.float32))
    kco_ref[:] = kc.astype(kco_ref.dtype)
    vco_ref[:] = vc.astype(vco_ref.dtype)

    G = G_ref[:]
    sm_scale = 1.0 / (d_k**0.5)
    self_out = _attend_block(q, kc, vc, smask_ref[:].astype(jnp.float32), G, sm_scale)
    self_out = (
        jax.lax.dot_general(
            self_out, wo_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[0][None, :]
    )
    x1 = _ln(x + self_out, ln1s_ref[0][None, :], ln1b_ref[0][None, :])

    # cross-attention over precomputed encoder K/V
    q2 = (
        jax.lax.dot_general(
            x1, wqc_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqc_ref[0][None, :]
    )
    cross_out = _attend_block(
        q2, ck_ref[:].astype(jnp.float32), cv_ref[:].astype(jnp.float32),
        cmask_ref[:].astype(jnp.float32), G, sm_scale,
    )
    cross_out = (
        jax.lax.dot_general(
            cross_out, woc_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + boc_ref[0][None, :]
    )
    x2 = _ln(x1 + cross_out, ln2s_ref[0][None, :], ln2b_ref[0][None, :])

    # FFN
    h = jnp.maximum(
        jax.lax.dot_general(
            x2, w1_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[0][None, :],
        0.0,
    )
    ff = (
        jax.lax.dot_general(
            h, w2_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0][None, :]
    )
    x3 = _ln(x2 + ff, ln3s_ref[0][None, :], ln3b_ref[0][None, :])
    y_ref[:] = x3.astype(y_ref.dtype)


def _group_matrix(d_model: int, n_heads: int) -> np.ndarray:
    d_k = d_model // n_heads
    G = np.zeros((d_model, n_heads), np.float32)
    for h in range(n_heads):
        G[h * d_k : (h + 1) * d_k, h] = 1.0
    return G


def fused_layer_step(
    x: jnp.ndarray,  # (N, D)
    k_cache: jnp.ndarray,  # (N, L, D)
    v_cache: jnp.ndarray,
    cross_k: jnp.ndarray,  # (N, M, D)
    cross_v: jnp.ndarray,
    self_mask: jnp.ndarray,  # (N, L) bool True = masked
    cross_mask: jnp.ndarray,  # (N, M) bool
    t: jnp.ndarray,  # () int32
    weights: Dict[str, jnp.ndarray],
    n_heads: int,
    block_rows: int = 16,
):
    """One decoder layer's decode step; returns (y, k_cache, v_cache)."""
    N, D = x.shape
    L = k_cache.shape[1]
    M = cross_k.shape[1]
    BN = min(block_rows, N)
    assert N % BN == 0, (N, BN)
    G = jnp.asarray(_group_matrix(D, n_heads))
    t_arr = jnp.reshape(t.astype(jnp.int32), (1,))

    def row_spec(shape):
        return pl.BlockSpec((BN,) + shape, lambda i: (i,) + (0,) * len(shape))

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    w = weights
    kernel = functools.partial(_kernel, d_k=D // n_heads, n_heads=n_heads)
    grid = (N // BN,)

    y, kc, vc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM if _HAS_PLTPU else None),  # t
            row_spec((D,)),
            row_spec((L, D)), row_spec((L, D)),
            row_spec((M, D)), row_spec((M, D)),
            row_spec((L,)), row_spec((M,)),
            full_spec((D, n_heads)),
            full_spec((D, 3 * D)), full_spec((1, 3 * D)),
            full_spec((D, D)), full_spec((1, D)),
            full_spec((1, D)), full_spec((1, D)),
            full_spec((D, D)), full_spec((1, D)),
            full_spec((D, D)), full_spec((1, D)),
            full_spec((1, D)), full_spec((1, D)),
            full_spec((D, w["w1"].shape[1])), full_spec((1, w["w1"].shape[1])),
            full_spec((w["w1"].shape[1], D)), full_spec((1, D)),
            full_spec((1, D)), full_spec((1, D)),
        ],
        out_specs=[
            row_spec((D,)),
            row_spec((L, D)),
            row_spec((L, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={2: 1, 3: 2},  # k_cache, v_cache in-place
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if _HAS_PLTPU and not _interpret()
            else None
        ),
        interpret=_interpret(),
    )(
        t_arr, x, k_cache, v_cache, cross_k, cross_v,
        self_mask.astype(jnp.int8), cross_mask.astype(jnp.int8), G,
        w["wqkv"], w["bqkv"].reshape(1, -1),
        w["wo"], w["bo"].reshape(1, -1),
        w["ln1s"].reshape(1, -1), w["ln1b"].reshape(1, -1),
        w["wqc"], w["bqc"].reshape(1, -1),
        w["woc"], w["boc"].reshape(1, -1),
        w["ln2s"].reshape(1, -1), w["ln2b"].reshape(1, -1),
        w["w1"], w["b1"].reshape(1, -1),
        w["w2"], w["b2"].reshape(1, -1),
        w["ln3s"].reshape(1, -1), w["ln3b"].reshape(1, -1),
    )
    return y, kc, vc
