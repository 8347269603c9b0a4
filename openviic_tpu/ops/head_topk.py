"""Fused vocab head + logsumexp + per-row top-k as one Pallas kernel.

The decode step's tail — vocab projection (D x |V|), log-softmax
normaliser, and per-beam top-k — costs ~150 us/step as ~15 XLA fusions
(head matmul slices, f32 conversions, tile reshapes/pads, 5 argmax
refinements; PERF.md round-2 analysis).  This kernel does all of it in one
pallas_call with the logits staying in VMEM:

 - the head matmul runs in |V|-tiles (bf16 x bf16, f32 accumulation),
   writing a VMEM logits scratch once;
 - logsumexp per row from a running max + one exp-sum pass;
 - exact top-k by k rounds of (row max -> first-index argmax -> mask),
   identical tie order to the two-stage selection (first-lowest index);
 - outputs: top-k values (raw logits) and indices, plus the per-row lse.

Strictly 2-D shapes throughout (the Mosaic-compilable idiom measured in
ops/resident_layer_step.py).  The beam-search fast path combines these
with the sequence log-prob offset and the analytic -999 finished-beam
candidates outside the kernel (cheap (bs, beam)-sized math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_LANES = 128
_NEG = -1e30

# VMEM budget used to auto-select the row-blocked variant: the single-block
# kernel needs an (N, Vp) f32 logits scratch + the (D, Vp) bf16 weights in
# VMEM at once; past this many scratch bytes we switch to row blocks so the
# weights stay resident while row blocks stream (vmem_limit is 100 MB).
_AUTO_BLOCK_SCRATCH_BYTES = 80 * 1024 * 1024
_AUTO_BLOCK_ROWS = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    x_ref,  # (N, D) bf16
    w_ref,  # (D, Vp) bf16 (lane-padded vocab; pad columns = 0 weights)
    vals_ref,  # (N, 128) f32 out — top-k raw logits in lanes 0..k-1
    idxs_ref,  # (N, 128) i32 out — top-k word ids in lanes 0..k-1
    lse_ref,  # (N, 128) f32 out — logsumexp broadcast across lanes
    logits_scr,  # VMEM (N, Vp) f32
    *, k: int, tile: int, vocab: int,
):
    x = x_ref[:]
    N = x.shape[0]
    Vp = w_ref.shape[1]
    n_tiles = Vp // tile

    # vocab-tiled head matmul into the VMEM scratch; pad columns get -inf
    col_tile = jax.lax.broadcasted_iota(jnp.int32, (N, tile), 1)
    for v in range(n_tiles):
        logit_v = jax.lax.dot_general(
            x, w_ref[:, v * tile : (v + 1) * tile],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # round through bf16: the XLA path materialises the fc output in
        # bf16 before the f32 cast, so this keeps the kernel token-exact
        # against it (same ties, same lse inputs)
        logit_v = logit_v.astype(jnp.bfloat16).astype(jnp.float32)
        valid = (col_tile + v * tile) < vocab
        logits_scr[:, v * tile : (v + 1) * tile] = jnp.where(
            valid, logit_v, _NEG
        )

    logits = logits_scr[:]
    m = jnp.max(logits, axis=1, keepdims=True)  # (N, 1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
    lse_ref[:] = jnp.broadcast_to(lse, (N, _LANES))

    col = jax.lax.broadcasted_iota(jnp.int32, (N, Vp), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, _LANES), 1)
    vals = jnp.full((N, _LANES), _NEG, jnp.float32)
    idxs = jnp.zeros((N, _LANES), jnp.int32)
    for i in range(k):
        vi = jnp.max(logits, axis=1, keepdims=True)  # (N, 1)
        ji = jnp.argmax(logits, axis=1)[:, None]  # (N, 1) first index on ties
        vals = jnp.where(lane == i, vi, vals)
        idxs = jnp.where(lane == i, ji, idxs)
        logits = jnp.where(col == ji, _NEG, logits)
    vals_ref[:] = vals
    idxs_ref[:] = idxs


def head_topk(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k: int,
    tile: int = 2048,
    block_rows: int | None = None,
):
    """x: (N, D); w: (D, V) vocab head kernel (no bias, decoders.py:90).

    Returns (vals (N, k) f32 raw logits, idxs (N, k) i32, lse (N,) f32).

    ``block_rows``: process rows in grid blocks of this size.  The weight
    block's index map is constant, so Mosaic keeps ``w`` VMEM-resident
    across grid steps while row blocks double-buffer — the logits scratch
    shrinks from (N, Vp) to (block, Vp) f32, lifting the single-block VMEM
    ceiling (N*Vp*4 > vmem_limit at N >= ~2.4k) so batch can keep scaling.
    ``None`` = single block (the round-3 default, fastest at N <= 1920),
    unless the scratch would blow the VMEM budget — then the blocked
    variant is auto-selected so ``head_kernel=True`` keeps working at any
    batch size instead of failing at N >= ~2.2k."""
    N, D = x.shape
    V = w.shape[1]
    Vp = -(-V // tile) * tile
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))

    if block_rows is None and N * Vp * 4 > _AUTO_BLOCK_SCRATCH_BYTES:
        block_rows = _AUTO_BLOCK_ROWS

    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if _HAS_PLTPU and not _interpret()
        else None
    )
    if block_rows is None or block_rows >= N:
        kernel = functools.partial(_kernel, k=k, tile=tile, vocab=V)
        vmem = (
            pl.BlockSpec(memory_space=pltpu.VMEM) if _HAS_PLTPU else pl.BlockSpec()
        )
        vals, idxs, lse = pl.pallas_call(
            kernel,
            in_specs=[vmem, vmem],
            out_specs=[vmem] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((N, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((N, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((N, _LANES), jnp.float32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((N, Vp), jnp.float32)] if _HAS_PLTPU else []
            ),
            compiler_params=compiler_params,
            interpret=_interpret(),
        )(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
        return vals[:, :k], idxs[:, :k], lse[:, 0]

    NB = block_rows
    Np = -(-N // NB) * NB
    xp = jnp.pad(x, ((0, Np - N), (0, 0))) if Np != N else x
    kernel = functools.partial(_kernel, k=k, tile=tile, vocab=V)
    out_spec = pl.BlockSpec((NB, _LANES), lambda i: (i, 0))
    vals, idxs, lse = pl.pallas_call(
        kernel,
        grid=(Np // NB,),
        in_specs=[
            pl.BlockSpec((NB, D), lambda i: (i, 0)),
            # constant index map: w stays VMEM-resident across grid steps
            pl.BlockSpec((D, Vp), lambda i: (0, 0)),
        ],
        out_specs=[out_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((Np, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Np, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((Np, _LANES), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((NB, Vp), jnp.float32)] if _HAS_PLTPU else []
        ),
        compiler_params=compiler_params,
        interpret=_interpret(),
    )(xp.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    return vals[:N, :k], idxs[:N, :k], lse[:N, 0]
