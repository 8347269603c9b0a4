"""Fused geometric-bias attention: bias computed in-kernel from raw boxes.

The ORT/DLCT attention adds a per-head geometric bias
``log(clip(relu(fc_g(box_relational_embedding(boxes))), 1e-6))`` to the
scores (reference models/modules/encoders.py:65-112 + attentions.py:60-114).
Materialising that bias costs O(bs * h * n^2) HBM traffic — 315 MB at
n=784 — and dominates both the XLA and the tiled-flash paths (PERF.md
round-2 long-context check).  This kernel recomputes the bias from the
(bs, n, 4) boxes *inside* the attention tile, turning the quadratic HBM
object into quadratic VMEM compute:

 - per (batch, q-tile) grid instance: the four log-space displacement
   planes (models/geometry.py:28-43) are built once (2-D ops), then the
   trigonometric embedding + per-head fc_g reduce folds into 32 sin/cos
   planes with 8 scalar FMAs each — never materialising the
   (n, n, 64) embedding either;
 - heads live on a leading axis ((bs, h, n, d_k) inputs) so per-head
   score/PV matmuls are plain 2-D dot_generals (the Mosaic-compilable
   idiom, see ops/resident_layer_step.py design notes);
 - padding is handled by an additive column mask; softmax is full-row
   (caption-scale n fits VMEM comfortably; n=784 planes are 400 KB).

Numerics: sin/cos + weighting in f32; score matmuls bf16 x bf16 with f32
accumulation.  Enabled per-encoder with ``OPENVIIC_GEO_FUSED=1``
(GeometricEncoder); ``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools
import os

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


def geo_fused_enabled() -> bool:
    return os.environ.get("OPENVIIC_GEO_FUSED", "") in ("1", "true")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    q_ref,  # (1, h, TQ, dk) bf16
    k_ref,  # (1, h, n, dk) bf16
    v_ref,  # (1, h, n, dk) bf16
    geo_ref,  # (1, 8, n) f32: rows cx, cy, log w, log h (rest zero)
    geoq_ref,  # (1, 8, TQ) f32: the same rows, q-tile blocked
    mask_ref,  # (1, 1, n) f32: 1.0 = masked column
    wsin_ref,  # SMEM (4*8*h,) f32 — fc_g kernel rows for the sin half
    wcos_ref,  # SMEM (4*8*h,) f32 — ... cos half
    bias_ref,  # SMEM (h,) f32 — fc_g bias
    o_ref,  # (1, h, TQ, dk) out
    *, n_heads: int, tq: int, dim_g: int, wave_len: float, sm_scale: float,
):
    n = k_ref.shape[2]
    n_freq = dim_g // 8

    geo = geo_ref[0]  # (8, n) f32
    cx_k = geo[0:1, :]  # (1, n)
    cy_k = geo[1:2, :]
    lw_k = geo[2:3, :]
    lh_k = geo[3:4, :]

    geoq = geoq_ref[0]  # (8, TQ) f32 — query-side rows for this tile
    cx_q = geoq[0:1, :].T  # (TQ, 1)
    cy_q = geoq[1:2, :].T
    lw_q = geoq[2:3, :].T
    lh_q = geoq[3:4, :].T

    # displacement planes (TQ, n), models/geometry.py:36-43
    w_q = jnp.exp(lw_q)
    h_q = jnp.exp(lh_q)
    disp = [
        jnp.log(jnp.maximum(jnp.abs((cx_q - cx_k) / w_q), 1e-3)),
        jnp.log(jnp.maximum(jnp.abs((cy_q - cy_k) / h_q), 1e-3)),
        lw_q - lw_k,
        lh_q - lh_k,
    ]

    # fold trig embedding + fc_g: acc_h = sum_{s,f} wsin*sin + wcos*cos
    accs = [jnp.zeros((tq, n), jnp.float32) for _ in range(n_heads)]
    for s in range(4):
        for f in range(n_freq):
            omega = 100.0 / (wave_len ** (f / n_freq))
            m = disp[s] * omega
            sinp = jnp.sin(m)
            cosp = jnp.cos(m)
            base = (s * n_freq + f) * n_heads
            for h in range(n_heads):
                accs[h] = (
                    accs[h]
                    + wsin_ref[base + h] * sinp
                    + wcos_ref[base + h] * cosp
                )

    mask_neg = mask_ref[0]  # (1, n) f32, 1 = masked
    for h in range(n_heads):
        bias = jnp.log(
            jnp.maximum(jnp.maximum(accs[h] + bias_ref[h], 0.0), 1e-6)
        )
        q_h = q_ref[0, h]  # (TQ, dk)
        k_h = k_ref[0, h]  # (n, dk)
        s_h = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        s_h = s_h + bias + mask_neg * _NEG
        mx = jnp.max(s_h, axis=1, keepdims=True)
        e = jnp.exp(s_h - mx)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        o_h = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_h := v_ref[0, h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o_h.astype(o_ref.dtype)


def geo_fused_attention(
    q: jnp.ndarray,  # (bs, n, h, dk)
    k: jnp.ndarray,
    v: jnp.ndarray,
    boxes: jnp.ndarray,  # (bs, n, 4) (x_min, y_min, x_max, y_max)
    fc_g_kernel: jnp.ndarray,  # (dim_g, h)
    fc_g_bias: jnp.ndarray,  # (h,)
    padding_mask: jnp.ndarray,  # (bs, 1, 1, n) bool True = masked
    sm_scale: float,
    wave_len: float = 1000.0,
    tile_q: int = 128,
):
    """Returns (bs, n, h, dk) attention output with the geometric bias
    computed in-kernel (log-relu-fc_g of the trig box embedding)."""
    bs, n, h, dk = q.shape
    dim_g = fc_g_kernel.shape[0]
    tq = min(tile_q, n)
    n_pad = -(-n // tq) * tq

    def to_bh(x):  # (bs, n, h, dk) -> (bs, h, n_pad, dk)
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    # geometry rows: cx, cy, log w, log h (models/geometry.py:30-33)
    x_min, y_min, x_max, y_max = [boxes[..., i] for i in range(4)]
    geo = jnp.stack(
        [
            (x_min + x_max) * 0.5,
            (y_min + y_max) * 0.5,
            jnp.log((x_max - x_min) + 1.0),
            jnp.log((y_max - y_min) + 1.0),
        ],
        axis=1,
    )  # (bs, 4, n)
    geo = jnp.pad(geo, ((0, 0), (0, 4), (0, n_pad - n))).astype(jnp.float32)

    mask = jnp.pad(
        padding_mask.reshape(bs, 1, n).astype(jnp.float32),
        ((0, 0), (0, 0), (0, n_pad - n)),
        constant_values=1.0,
    )

    # fc_g split into sin/cos halves, flattened (s, f, h)-major for SMEM
    wsin = fc_g_kernel[: dim_g // 2].reshape(-1).astype(jnp.float32)
    wcos = fc_g_kernel[dim_g // 2 :].reshape(-1).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, n_heads=h, tq=tq, dim_g=dim_g, wave_len=wave_len,
        sm_scale=sm_scale,
    )
    vmem = (
        pl.BlockSpec if True else None
    )
    grid = (bs, n_pad // tq)

    def bspec(shape, imap):
        if _HAS_PLTPU:
            return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, imap)

    smem = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if _HAS_PLTPU
        else pl.BlockSpec()
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((1, h, tq, dk), lambda b, i: (b, 0, i, 0)),
            bspec((1, h, n_pad, dk), lambda b, i: (b, 0, 0, 0)),
            bspec((1, h, n_pad, dk), lambda b, i: (b, 0, 0, 0)),
            bspec((1, 8, n_pad), lambda b, i: (b, 0, 0)),
            bspec((1, 8, tq), lambda b, i: (b, 0, i)),
            bspec((1, 1, n_pad), lambda b, i: (b, 0, 0)),
            smem, smem, smem,
        ],
        out_specs=bspec((1, h, tq, dk), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bs, h, n_pad, dk), q.dtype),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if _HAS_PLTPU and not _interpret()
            else None
        ),
        interpret=_interpret(),
    )(
        qb.astype(jnp.bfloat16), kb.astype(jnp.bfloat16),
        vb.astype(jnp.bfloat16), geo, geo, mask,
        wsin, wcos, fc_g_bias.astype(jnp.float32),
    )
    return out.transpose(0, 2, 1, 3)[:, :n]
