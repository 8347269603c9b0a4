"""Fused beam-select self-attention decode step as one Pallas kernel.

With the head+top-k kernel shipped (ops/head_topk.py) the decode step's
largest remaining cost is the beam-resident self-attention
(``MultiHeadAttention.attend_projected_beam_select``): XLA runs it as two
fusions per layer (QK scores + PV reduction) over a materialised
``(bs, q_beam, p_beam, L, h)`` f32 score tensor — head-minor layouts that
fill 8 of 128 lanes, plus ~16 MB of intermediate HBM traffic per fusion
pair (round-3 xplane profile: ~286 us/layer/step of the ~2.26 ms step at
batch 320).

This kernel does the whole read side in one pallas_call per layer:

 - ancestry one-hot selection of each query beam's true K/V rows out of
   the image's ``beam`` unreordered cache slots (exact: the weights are
   0/1, so the mul-add "gather" reproduces the cache values bit-for-bit);
 - per-head QK scores via the block-diagonal group matrix G (the
   Mosaic-friendly head reduction proven in ops/fused_decoder_step.py) —
   products of bf16 inputs are exact in f32, matching the XLA einsum's
   ``preferred_element_type=f32`` accumulation class;
 - mask + softmax over the selected positions (identical live set to the
   XLA path's joint (slot, position) softmax — exactly one live slot per
   position, and exp(-1e30 - m) underflows to the same exact zeros);
 - PV reduction against the selected V rows.

No weights enter the kernel, so the per-block weight re-DMA that sank the
whole-layer kernels (ops/resident_layer_step.py, ops/fused_decoder_step.py)
cannot occur; the only HBM traffic is the one unavoidable pass over the
K/V caches, read in their natural while-carry layout (N, L, h*d) with no
relayout.

Reference semantics being accelerated: the lazy beam reorder replacing
``apply_to_states`` (reference models/modules/beam_search.py:61,
containers.py:27-32); numerics mirror
``MultiHeadAttention.attend_projected_beam_select`` (models/attention.py).
Enabled with ``beam_search(..., attn_kernel=True)`` /
``TRAINING.DECODE_ATTN_KERNEL``.

MEASURED NEGATIVE (2026-08-19, jax/jaxlib 0.9.0, v5e): in-loop the kernel
LOSES to the XLA einsum path — 38.8 ms/batch-96 vs 25.5 (XLA) / 22.8
(head+top-k kernel), i.e. ~450 us/layer-step vs ~286 us — and at batch
320 it faults the TPU worker inside the decode while_loop (standalone
pallas_call at identical shapes/blocks runs fine; the fault needs the
full loop context).  Root cause of the slowdown: the ancestry selection
costs 2·beam² VPU passes over (IB, L, D) scratch per step, which dwarfs
the layout/HBM win over XLA's two batched MXU einsums; the selection
cannot ride the MXU because Mosaic has no batched-gather and the
per-image score matrix (beam x beam*L) is too small to tile.  Kept for
parity testing (interpret-mode exact vs the einsum path) and future
toolchain retries; OFF in all configs — do not enable at batch >96.
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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _group_matrix(d: int, h: int) -> np.ndarray:
    """(h*d_h, h) block-diagonal head-grouping matrix."""
    d_h = d // h
    G = np.zeros((d, h), np.float32)
    for i in range(h):
        G[i * d_h : (i + 1) * d_h, i] = 1.0
    return G


def _kernel(
    q_ref,  # (IB*beam, Dk)
    k_ref,  # (IB*beam, L, Dk)
    v_ref,  # (IB*beam, L, Dv)
    anc_ref,  # (IB, beam, L) i32
    pmask_ref,  # (IB*beam, L) f32, 1.0 = masked
    gk_ref,  # (Dk, h) f32
    gv_ref,  # (Dv, h) f32
    out_ref,  # (IB*beam, Dv) f32
    *, n_beams: int, sm_scale: float, mask_axis: str,
):
    Dk = q_ref.shape[1]
    Dv = v_ref.shape[2]
    L = k_ref.shape[1]
    IB = anc_ref.shape[0]

    # f32 inside the kernel and strictly 2-D dots — the Mosaic-lowerable
    # idioms proven by ops/fused_decoder_step.py::_attend_block (minor-dim
    # broadcast insertion is 32-bit-only; (B, S, D) -> (B*S, D) reshapes
    # around the dot are supported)
    q = q_ref[:].astype(jnp.float32).reshape(IB, n_beams, Dk)
    k4 = k_ref[:].astype(jnp.float32).reshape(IB, n_beams, L, Dk)
    v4 = v_ref[:].astype(jnp.float32).reshape(IB, n_beams, L, Dv)
    anc = anc_ref[:]  # (IB, beam, L)
    pm = pmask_ref[:].reshape(IB, n_beams, L)
    Gk = gk_ref[:]
    Gv = gv_ref[:]

    outs = []
    for j in range(n_beams):
        qj = q[:, j]  # (IB, Dk)
        ancj = anc[:, j]  # (IB, L)
        # one-hot "gather": exactly one slot matches per (image, position),
        # so the mul-add sum reproduces the ancestor's K/V rows exactly
        # (w in {0,1}; 1.0*x == x and 0 + x == x in every float dtype)
        ksel = jnp.zeros((IB, L, Dk), jnp.float32)
        vsel = jnp.zeros((IB, L, Dv), jnp.float32)
        dead = jnp.zeros((IB, L), jnp.float32)
        for p in range(n_beams):
            w = (ancj == p).astype(jnp.float32)  # (IB, L)
            ksel = ksel + w[:, :, None] * k4[:, p]
            vsel = vsel + w[:, :, None] * v4[:, p]
            if mask_axis == "p":
                # raw per-slot mask: position t is masked iff the mask of
                # its ancestor slot is set at t (attention.py mask_axis='p')
                dead = dead + w * pm[:, p]
        if mask_axis != "p":
            dead = pm[:, j]

        # per-head scores: exact f32 products (bf16 x bf16 fits in f32),
        # head reduction on the MXU via Gk — same accumulation class as
        # the XLA einsum with preferred_element_type=f32
        prod = ksel * qj[:, None, :]  # (IB, L, Dk)
        s = jax.lax.dot_general(
            prod.reshape(IB * L, Dk), Gk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(IB, L, -1)  # (IB, L, h)
        s = s * sm_scale + dead[:, :, None] * _NEG
        m = jnp.max(s, axis=1, keepdims=True)  # (IB, 1, h)
        e = jnp.exp(s - m)
        att = e / jnp.sum(e, axis=1, keepdims=True)  # (IB, L, h)
        pe = jax.lax.dot_general(
            att.reshape(IB * L, -1), Gv.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(IB, L, Dv)
        oj = jnp.sum(vsel * pe, axis=1)  # (IB, Dv)
        outs.append(oj[:, None, :])
    out_ref[:] = jnp.concatenate(outs, axis=1).reshape(IB * n_beams, Dv)


def _pick_block(b_s: int, n_beams: int, L: int, Dk: int, Dv: int,
                itemsize: int) -> int:
    """Largest image-block <= the VMEM budget that divides b_s."""
    # K+V blocks double-buffered + their in-kernel f32 copies + the f32
    # selection scratch per beam
    per_image = (
        n_beams * L * (Dk + Dv) * (itemsize * 2 + 4) + L * (Dk + Dv) * 8
    )
    budget = 48 * 1024 * 1024
    cap = max(1, min(b_s, budget // max(per_image, 1), 64))
    for ib in range(cap, 0, -1):
        if b_s % ib == 0:
            return ib
    return 1


def beam_select_attention(
    q_t: jnp.ndarray,  # (N, 1, h, d_k) this step's projected queries
    k: jnp.ndarray,  # (N, L, h, d_k) append-only cache (N = bs*beam)
    v: jnp.ndarray,  # (N, L, h, d_v)
    ancestry: jnp.ndarray,  # (bs, beam, L) i32
    position_mask: jnp.ndarray,  # (N, 1, 1, L) bool True = masked
    mask_axis: str = "q",
    block_images: int | None = None,
) -> jnp.ndarray:
    """Fused equivalent of ``attend_projected_beam_select`` (pre-output
    projection): returns (N, 1, h, d_v) attention outputs in q_t.dtype."""
    b_s, n_beams, L = ancestry.shape
    N, _, h, d_k = q_t.shape
    d_v = v.shape[3]
    Dk, Dv = h * d_k, h * d_v

    q2 = q_t.reshape(N, Dk)
    k3 = k.reshape(N, L, Dk)
    v3 = v.reshape(N, L, Dv)
    pm = position_mask.reshape(N, L).astype(jnp.float32)
    anc = ancestry.astype(jnp.int32)
    Gk = jnp.asarray(_group_matrix(Dk, h))
    Gv = jnp.asarray(_group_matrix(Dv, h))

    if block_images is None:
        env = os.environ.get("OPENVIIC_ATTN_BLOCK")
        if env:
            block_images = int(env)
    IB = block_images or _pick_block(
        b_s, n_beams, L, Dk, Dv, np.dtype(k.dtype).itemsize
    )
    if b_s % IB != 0:
        # grid=(b_s // IB,) would silently truncate: the trailing images'
        # output rows would never be written and come back as garbage
        raise ValueError(
            f"block_images={IB} (arg or OPENVIIC_ATTN_BLOCK) must divide "
            f"the image batch {b_s}"
        )
    NB = IB * n_beams
    kernel = functools.partial(
        _kernel,
        n_beams=n_beams,
        sm_scale=1.0 / float(np.sqrt(d_k)),
        mask_axis=mask_axis,
    )
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if _HAS_PLTPU and not _interpret()
        else None
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_s // IB,),
        in_specs=[
            pl.BlockSpec((NB, Dk), lambda i: (i, 0)),
            pl.BlockSpec((NB, L, Dk), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, L, Dv), lambda i: (i, 0, 0)),
            pl.BlockSpec((IB, n_beams, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, L), lambda i: (i, 0)),
            # constant index maps: the tiny G matrices stay VMEM-resident
            pl.BlockSpec((Dk, h), lambda i: (0, 0)),
            pl.BlockSpec((Dv, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NB, Dv), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Dv), jnp.float32),
        compiler_params=compiler_params,
        interpret=_interpret(),
    )(q2, k3, v3, anc, pm, Gk, Gv)
    return out.astype(q_t.dtype).reshape(N, 1, h, d_v)
