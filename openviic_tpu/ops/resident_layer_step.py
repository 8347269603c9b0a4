"""Beam-resident fused decoder-layer step as one Pallas kernel.

Replaces the ~40 small HLO fusions a decoder layer contributes to each
decode step (projections, beam-resident self-attention, cross-attention,
FFN, three LayerNorms) with a single pallas_call.  The decode profile
(PERF.md round 2) shows the step is bound by per-op overhead and DMA
staging of many small buffers — one kernel turns that into a handful of
large VMEM loads.

Design notes (v3 — shaped by Mosaic's restrictions measured on v5e):

 - **Strictly 2-D tensors.**  Mosaic handles (rows, lanes) natively;
   >3-d transposes/reshapes across the padded lane dim either fail to
   lower or explode compile time.  Caches are passed as (N, L*D) with the
   position axis unrolled in static Python loops (L is ~25 here).
 - **No cache rewrite.**  The kernel returns this step's K/V rows; the
   caller appends them with one dynamic_update_slice (in-place in the
   decode loop).  The round-1 kernel flowed the whole cache through VMEM
   and back every step — its downfall.
 - **Beam-resident ancestry resolution** by a block-diagonal one-hot
   matmul per position (an exact copy — 0/1 times bf16 is lossless),
   never a gather: ``rkv_j = onehot_j @ [K_j | V_j]``.
 - **Two-pass softmax** over positions: pass 1 computes masked scores per
   position (G-matrix head reduction) and the running max; pass 2
   accumulates exp-weighted values.  The current step's K/V (not yet in
   the cache) contributes an extra column.
 - Matmuls take bf16 operands with f32 accumulation; the q*k elementwise
   products round through bf16 (~1e-2 relative on scores — the same order
   as bf16 attention itself; tests bound row agreement + score deltas).

Enabled via ``beam_search(..., resident_kernel=True)``; ``interpret=True``
on CPU for tests.
"""

from __future__ import annotations

import functools
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
_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _group_matrix(d_model: int, n_heads: int) -> np.ndarray:
    """(D, 128) block-diagonal head-group matrix, lane-padded."""
    d_k = d_model // n_heads
    G = np.zeros((d_model, _LANES), np.float32)
    for h in range(n_heads):
        G[h * d_k : (h + 1) * d_k, h] = 1.0
    return G


def _ln(x32, scale, bias, eps=1e-5):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mm(a, b):  # bf16 x bf16 -> f32
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    t_ref,  # SMEM (1,)
    x_ref,  # (N, D) bf16
    anc_ref,  # (N, L) int32 — local beam slot per position
    smask_ref,  # (N, L) bf16 — raw per-slot pad|future, 1.0 = masked
    ispad_ref,  # (N, 1) int8 — current input token is <pad>
    cmask_ref,  # (N, M) int8 — cross mask, pre-expanded to rows
    G_ref,  # (D, 128) f32
    kv_ref,  # (N, L*2D) bf16 — [K_j | V_j] per position, appended cache
    ck_ref, cv_ref,  # (N, M*D) bf16 — cross K/V pre-expanded to rows
    wqkv_ref, bqkv_ref,
    wo_ref, bo_ref,
    wqc_ref, bqc_ref,
    woc_ref, boc_ref,
    w1_ref, b1_ref,
    w2_ref, b2_ref,
    lnp_ref,  # (6, D) f32
    y_ref, kn_ref, vn_ref,  # outputs (N, D)
    rv_scr,  # VMEM (N, L*D) bf16 — resolved V per position
    sc_scr,  # VMEM (N, L*128) f32 — masked scores per position
    *, n_heads: int, beam: int, L: int, M: int,
):
    t = t_ref[0]
    x = x_ref[:].astype(jnp.float32)  # (N, D)
    N, D = x.shape
    d_k = D // n_heads
    scale = 1.0 / (d_k**0.5)
    G = G_ref[:]
    Gb = G.astype(jnp.bfloat16)
    GbT = Gb.T
    lnp = lnp_ref[:]

    # block-diagonal one-hot machinery: target global row per (row, slot)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    base = (row_id // beam) * beam  # first row of this row's image group
    col_id = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)

    # ---- projections -----------------------------------------------------
    qkv = _mm(x, wqkv_ref[:]) + bqkv_ref[0][None, :]
    q = qkv[:, :D]
    k_new = qkv[:, D : 2 * D]
    v_new = qkv[:, 2 * D :]
    kn_ref[:] = k_new.astype(kn_ref.dtype)
    vn_ref[:] = v_new.astype(vn_ref.dtype)

    qs = (q * scale).astype(jnp.bfloat16)  # (N, D)

    # ---- self-attention pass 1: resolve + scores + running max ----------
    s_new = _mm(qs * k_new.astype(jnp.bfloat16), Gb)  # (N, 128)
    s_new = s_new + ispad_ref[:].astype(jnp.float32) * _NEG
    m = s_new  # (N, 128) running max
    for j in range(L):
        tgt = base + anc_ref[:, j : j + 1]  # (N, 1) ancestor global row
        onehot = (col_id == tgt).astype(jnp.bfloat16)  # (N, N)
        rkv = _mm(onehot, kv_ref[:, j * 2 * D : (j + 1) * 2 * D])  # (N, 2D) f32
        rk = rkv[:, :D].astype(jnp.bfloat16)
        rv_scr[:, j * D : (j + 1) * D] = rkv[:, D:].astype(jnp.bfloat16)
        s_j = _mm(rk * qs, Gb)  # (N, 128)
        # the raw per-slot mask resolves through the same one-hot (the
        # future part is row-independent, the pad part is per-slot);
        # cache column t is stale (k_new/v_new carry this step) — masked
        mcol = _mm(onehot, smask_ref[:, j : j + 1])  # (N, 1)
        stale = (jnp.full((N, 1), j, jnp.int32) == t).astype(jnp.float32)
        s_j = s_j + jnp.maximum(mcol, stale) * _NEG
        sc_scr[:, j * _LANES : (j + 1) * _LANES] = s_j
        m = jnp.maximum(m, s_j)

    # ---- self-attention pass 2: exp-weighted accumulation ----------------
    e_new = jnp.exp(s_new - m)
    denom = e_new
    acc = _mm(e_new, GbT) * v_new  # (N, D) f32
    for j in range(L):
        e_j = jnp.exp(sc_scr[:, j * _LANES : (j + 1) * _LANES] - m)
        denom = denom + e_j
        pe_j = _mm(e_j, GbT)  # (N, D)
        acc = acc + pe_j * rv_scr[:, j * D : (j + 1) * D].astype(jnp.float32)

    dn = jax.lax.dot_general(
        denom, G.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    self_out = _mm(acc / dn, wo_ref[:]) + bo_ref[0][None, :]
    x = _ln(x + self_out, lnp[0][None, :], lnp[1][None, :])

    # ---- cross-attention (K/V pre-expanded to rows) ----------------------
    q2 = _mm(x, wqc_ref[:]) + bqc_ref[0][None, :]
    q2s = (q2 * scale).astype(jnp.bfloat16)
    m2 = jnp.full((N, _LANES), _NEG, jnp.float32)
    for j in range(M):
        s_j = _mm(ck_ref[:, j * D : (j + 1) * D] * q2s, Gb)
        s_j = s_j + cmask_ref[:, j : j + 1].astype(jnp.float32) * _NEG
        sc_scr[:, j * _LANES : (j + 1) * _LANES] = s_j
        m2 = jnp.maximum(m2, s_j)
    denom2 = jnp.zeros((N, _LANES), jnp.float32)
    acc2 = jnp.zeros((N, D), jnp.float32)
    for j in range(M):
        e_j = jnp.exp(sc_scr[:, j * _LANES : (j + 1) * _LANES] - m2)
        denom2 = denom2 + e_j
        pe_j = _mm(e_j, GbT)
        acc2 = acc2 + pe_j * cv_ref[:, j * D : (j + 1) * D].astype(jnp.float32)
    dn2 = jax.lax.dot_general(
        denom2, G.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    cross_out = _mm(acc2 / dn2, woc_ref[:]) + boc_ref[0][None, :]
    x = _ln(x + cross_out, lnp[2][None, :], lnp[3][None, :])

    # ---- FFN --------------------------------------------------------------
    hid = jnp.maximum(_mm(x, w1_ref[:]) + b1_ref[0][None, :], 0.0)
    ff = _mm(hid, w2_ref[:]) + b2_ref[0][None, :]
    x = _ln(x + ff, lnp[4][None, :], lnp[5][None, :])

    # reference layers zero their output where the input token is <pad>
    # (decoders.py:26)
    x = x * (1.0 - ispad_ref[:].astype(jnp.float32))
    y_ref[:] = x.astype(y_ref.dtype)


def resident_layer_step(
    x: jnp.ndarray,  # (N, 1, D) or (N, D)
    k_cache: jnp.ndarray,  # (N, L, h, d_k)
    v_cache: jnp.ndarray,
    cross_k: jnp.ndarray,  # (IMG, M, h, d_k)
    cross_v: jnp.ndarray,
    ancestry: jnp.ndarray,  # (IMG, beam, L) int32 local slots
    self_mask: jnp.ndarray,  # (N, 1, 1, L) bool — RAW per-slot, True = masked
    cross_mask: jnp.ndarray,  # (IMG, 1, 1, M) bool
    is_pad: jnp.ndarray,  # (N, 1) bool
    t: jnp.ndarray,  # () int32
    weights: Dict[str, jnp.ndarray],
    n_heads: int,
):
    """Returns (y (N,1,D), k_new (N,h,d_k), v_new (N,h,d_v))."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[:, 0, :]
    N, D = x.shape
    IMG, beam, L = ancestry.shape
    M = cross_k.shape[1]
    dtype = x.dtype

    # caches as 2-D [K_j | V_j] per position: (N, L*2D)
    kv = jnp.concatenate(
        [k_cache.reshape(N, L, D), v_cache.reshape(N, L, D)], axis=2
    ).reshape(N, L * 2 * D)
    # cross K/V expanded to rows once per decode (loop-invariant: XLA
    # hoists this out of the decode loop)
    ck = jnp.repeat(cross_k.reshape(IMG, M * D), beam, axis=0)
    cv = jnp.repeat(cross_v.reshape(IMG, M * D), beam, axis=0)
    cmask = jnp.repeat(cross_mask.reshape(IMG, M), beam, axis=0)

    G = jnp.asarray(_group_matrix(D, n_heads))
    t_arr = jnp.reshape(t.astype(jnp.int32), (1,))
    w = weights

    kernel = functools.partial(
        _kernel, n_heads=n_heads, beam=beam, L=L, M=M
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM) if _HAS_PLTPU else pl.BlockSpec()
    smem = pl.BlockSpec(memory_space=pltpu.SMEM) if _HAS_PLTPU else pl.BlockSpec()

    lnp = jnp.stack(
        [w["ln1s"], w["ln1b"], w["ln2s"], w["ln2b"], w["ln3s"], w["ln3b"]]
    ).astype(jnp.float32)

    scratch_dtype = jnp.bfloat16
    y, k_new, v_new = pl.pallas_call(
        kernel,
        in_specs=[smem] + [vmem] * 22,
        out_specs=[vmem] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((N, D), dtype),
            jax.ShapeDtypeStruct((N, D), dtype),
            jax.ShapeDtypeStruct((N, D), dtype),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((N, L * D), scratch_dtype),
                pltpu.VMEM((N, max(L, M) * _LANES), jnp.float32),
            ]
            if _HAS_PLTPU
            else [
                pl.MemoryRef((N, L * D), scratch_dtype)  # pragma: no cover
            ]
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
            if _HAS_PLTPU and not _interpret()
            else None
        ),
        interpret=_interpret(),
    )(
        t_arr,
        x,
        ancestry.reshape(N, L),
        self_mask.reshape(N, L).astype(jnp.bfloat16),
        is_pad.reshape(N, 1).astype(jnp.int8),
        cmask.astype(jnp.int8),
        G,
        kv, ck, cv,
        w["wqkv"], w["bqkv"].reshape(1, -1),
        w["wo"], w["bo"].reshape(1, -1),
        w["wqc"], w["bqc"].reshape(1, -1),
        w["woc"], w["boc"].reshape(1, -1),
        w["w1"], w["b1"].reshape(1, -1),
        w["w2"], w["b2"].reshape(1, -1),
        lnp,
    )
    d_k = D // n_heads
    out = y[:, None, :] if squeeze else y
    return (
        out,
        k_new.reshape(N, n_heads, d_k),
        v_new.reshape(N, n_heads, d_k),
    )
