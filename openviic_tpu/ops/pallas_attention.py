"""Fused multi-head attention Pallas kernel (flash-style online softmax).

One kernel serves all four reference attention variants (SURVEY.md §7.3):
the variant differences are expressed as an optional *additive bias*
(log-ReLU geometry for ORT, -inf masking for padding/causality) and as
K/V prefixes (M² memory slots) or suffixes (adaptive language column),
which the callers assemble before invoking the kernel.

Design for TPU:
 - grid (batch*heads, q_blocks, k_blocks); K-block axis innermost so the
   online-softmax accumulators (m, l, acc) live in VMEM scratch across the
   K sweep;
 - fp32 accumulation on the MXU via ``preferred_element_type``;
 - tiles padded to (8, 128) layout multiples; caption/region sequences are
   tiny, so a single K block is the common case — but the same kernel
   scales blockwise to long sequences (the long-context extension point,
   SURVEY.md §5);
 - masking is additive (-1e30) rather than -inf so fully-masked rows give
   a uniform distribution instead of NaN; such rows are padding queries
   whose outputs are zeroed by the caller (encoders.py:20 semantics), so
   results are identical where observable.

Enable with ``OPENVIIC_PALLAS=1`` (or ``=interpret`` to force interpreter
mode for CPU tests); ``pallas_enabled()`` reports the effective state.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly on TPU builds; guard for CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_INF = -1e30


def pallas_enabled() -> bool:
    flag = os.environ.get("OPENVIIC_PALLAS", "").lower()
    if flag in ("1", "true", "interpret"):
        return True
    return False


def _interpret_mode() -> bool:
    if os.environ.get("OPENVIIC_PALLAS", "").lower() == "interpret":
        return True
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
                 *, sm_scale: float, n_k_blocks: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]  # (block_k, dv)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    s = s * sm_scale
    if bias_ref is not None:
        s = s + bias_ref[0]

    m_prev = m_scr[:]  # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (block_q, block_k)

    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == n_k_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def _fused_attention_padded(q, k, v, bias, sm_scale, block_q, block_k, interpret):
    """q: (BH, nq, d), k/v: (BH, nk, d|dv), bias: (BH, nq, nk) or None."""
    BH, nq, d = q.shape
    nk = k.shape[1]
    dv = v.shape[2]
    n_q_blocks = nq // block_q
    n_k_blocks = nk // block_k

    grid = (BH, n_q_blocks, n_k_blocks)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, qb, kb: (b, qb, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, qb, kb: (b, kb, 0)),
        pl.BlockSpec((1, block_k, dv), lambda b, qb, kb: (b, kb, 0)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), lambda b, qb, kb: (b, qb, kb))
        )
        args.append(bias)
        kernel = functools.partial(
            _attn_kernel, sm_scale=sm_scale, n_k_blocks=n_k_blocks
        )
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            return _attn_kernel(
                q_ref, k_ref, v_ref, None, o_ref, m_scr, l_scr, acc_scr,
                sm_scale=sm_scale, n_k_blocks=n_k_blocks,
            )

    scratch_shapes = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, dv), jnp.float32),
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, dv), lambda b, qb, kb: (b, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, nq, dv), q.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)


class _InterpretFallback(Exception):
    pass


def _reference_attention(q, k, v, bias, sm_scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)


def fused_attention(
    q: jnp.ndarray,  # (B, nq, h, d)
    k: jnp.ndarray,  # (B, nk, h, d)
    v: jnp.ndarray,  # (B, nk, h, dv)
    bias: Optional[jnp.ndarray] = None,  # (B, h|1, nq|1, nk) additive (fp32)
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """Flash-style fused attention; returns (B, nq, h, dv)."""
    B, nq, h, d = q.shape
    nk = k.shape[1]
    dv = v.shape[3]
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if not _HAS_PLTPU:
        return _reference_attention(q, k, v, bias, sm_scale)

    interpret = _interpret_mode()

    # pad shapes to tile multiples
    pq = _round_up(nq, min(block_q, _round_up(nq, 8)))
    block_q = min(block_q, pq)
    pq = _round_up(nq, block_q)
    pk = _round_up(nk, min(block_k, _round_up(nk, 128)))
    block_k = min(block_k, pk)
    pk = _round_up(nk, block_k)
    pd = _round_up(d, 128)
    pdv = _round_up(dv, 128)

    # (B, n, h, d) -> (B*h, n, d)
    def to_bh(x, n, pn, dim, pdim):
        x = jnp.pad(x, ((0, 0), (0, pn - n), (0, 0), (0, pdim - dim)))
        return x.transpose(0, 2, 1, 3).reshape(B * h, pn, pdim)

    qb = to_bh(q.astype(jnp.float32), nq, pq, d, pd)
    kb = to_bh(k.astype(jnp.float32), nk, pk, d, pd)
    vb = to_bh(v.astype(jnp.float32), nk, pk, dv, pdv)

    bias_full = None
    need_bias = bias is not None or pk != nk
    if need_bias:
        b_f = jnp.zeros((B, h, nq, nk), jnp.float32) if bias is None else (
            jnp.broadcast_to(bias.astype(jnp.float32), (B, h, nq, nk))
        )
        b_f = jnp.pad(
            b_f, ((0, 0), (0, 0), (0, pq - nq), (0, pk - nk)),
            constant_values=_NEG_INF,
        )
        bias_full = b_f.reshape(B * h, pq, pk)

    out = _fused_attention_padded(
        qb, kb, vb, bias_full, sm_scale, block_q, block_k, interpret
    )

    out = out.reshape(B, h, pq, pdv)[:, :, :nq, :dv]
    return out.transpose(0, 2, 1, 3)
