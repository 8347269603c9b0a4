"""GPipe-style pipeline parallelism over a mesh axis (beyond-parity).

The reference has no pipeline parallelism (SURVEY.md §2.2 PP row: absent
— its 3-layer encoder/decoder stacks fit one device; reference
models/modules/encoders.py:33 is a plain per-device ModuleList).  PP was
documented out of scope for parity; this module implements it anyway as
the scale-out path for *deep* encoder stacks (high-resolution grid
features with many layers), completing the framework's parallelism table
alongside dp/tp/sp.

Design (the GPipe / scaling-book schedule, expressed as one SPMD
program):

 - The homogeneous layer stack's params are stacked on a leading layer
   axis and sharded over the ``pipe`` mesh axis — each device holds
   ``L / P`` consecutive layers (= one stage) and nothing else.
 - The (local) batch is split into ``M`` microbatches.  At tick ``t``
   stage ``s`` processes microbatch ``t - s``; after every tick the
   activations shift one stage forward via ``jax.lax.ppermute`` riding
   the ICI ring.  Total ticks ``M + P - 1``; bubble fraction
   ``(P - 1) / (M + P - 1)``.
 - Everything is a single ``lax.scan`` under ``shard_map``, so
   ``jax.grad`` differentiates straight through (ppermute transposes to
   the reverse ppermute) — no hand-written backward schedule.
 - Composes with data parallelism: pass ``batch_axis`` and the batch dim
   is sharded over it while the layer stack is sharded over ``axis``.

The output psum at the end broadcasts the last stage's result to every
stage (cheap: one activation-sized all-reduce per call) so callers see a
pipe-replicated tensor with ordinary batch sharding.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(layer_params: Sequence[Any]):
    """Stack per-layer param pytrees onto a leading layer axis.

    All layers must share one treedef (true for the framework's
    homogeneous ``EncoderLayer`` stacks)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *layer_params)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stacked_params,
    x: jnp.ndarray,
    aux: Any = None,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pipe",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run ``x`` through a layer stack pipelined over ``mesh[axis]``.

    Args:
      stage_fn: ``(layer_params, x, aux_mb) -> y`` applying ONE layer;
        ``y`` must have ``x``'s shape/dtype (residual-style stacks).
      stacked_params: pytree whose leaves have leading dim ``L`` (from
        :func:`stack_layer_params`); ``L`` must divide by the pipe-axis
        size ``P``; each device runs its ``L / P`` consecutive layers.
      x: (batch, ...) activations.  ``batch`` (the per-device batch when
        ``batch_axis`` is set) must divide by ``microbatches``.
      aux: optional pytree of per-example side inputs (masks, biases)
        with leading batch dim, microbatched alongside ``x`` and passed
        to every layer.
      microbatches: M. Bubble fraction is (P-1)/(M+P-1) — raise M to
        amortise; M=1 degenerates to sequential stage execution.
      batch_axis: optional mesh axis to shard the batch dim over
        (combined data+pipeline parallelism).

    Returns ``(batch, ...)`` activations, pipe-replicated, batch-sharded
    over ``batch_axis`` when given.
    """
    n_stages = mesh.shape[axis]
    layer_leaves = jax.tree.leaves(stacked_params)
    if not layer_leaves:
        raise ValueError("stacked_params has no leaves")
    n_layers = layer_leaves[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} layers not divisible into {n_stages} pipeline stages"
        )
    m = int(microbatches)
    if m < 1:
        raise ValueError("microbatches must be >= 1")
    local_batch = x.shape[0]
    if batch_axis is not None:
        if local_batch % mesh.shape[batch_axis] != 0:
            raise ValueError(
                f"batch {local_batch} not divisible by mesh axis "
                f"'{batch_axis}' of size {mesh.shape[batch_axis]}"
            )
        local_batch //= mesh.shape[batch_axis]
    if local_batch % m != 0:
        raise ValueError(
            f"per-device batch {local_batch} not divisible into {m} microbatches"
        )

    def local(params_stage, x_loc, aux_loc):
        p = jax.lax.psum(1, axis)  # == n_stages (static under SPMD)
        s = jax.lax.axis_index(axis)
        bm = x_loc.shape[0] // m
        xm = x_loc.reshape((m, bm) + x_loc.shape[1:])
        auxm = jax.tree.map(
            lambda a: a.reshape((m, a.shape[0] // m) + a.shape[1:]), aux_loc
        )
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            buf, outs = carry
            # the microbatch arriving at stage s at tick t (clipped during
            # fill/drain ticks where this stage computes garbage that is
            # never observed)
            mb = jnp.clip(t - s, 0, m - 1)
            inject = jax.lax.dynamic_index_in_dim(xm, mb, 0, keepdims=False)
            xin = jnp.where(s == 0, inject, buf)
            aux_t = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb, 0, keepdims=False),
                auxm,
            )

            def layer_body(h, lp):
                return stage_fn(lp, h, aux_t), None

            y, _ = jax.lax.scan(layer_body, xin, params_stage)
            # last stage emits microbatch t-(P-1) at tick t; earlier ticks
            # clip to slot 0, which tick t = P-1 then overwrites with the
            # real microbatch-0 output
            out_idx = jnp.clip(t - (p - 1), 0, m - 1)
            outs = jax.lax.dynamic_update_index_in_dim(outs, y, out_idx, 0)
            buf = jax.lax.ppermute(y, axis, perm) if perm else y
            return (buf, outs), None

        buf0 = jnp.zeros((bm,) + x_loc.shape[1:], x_loc.dtype)
        outs0 = jnp.zeros((m, bm) + x_loc.shape[1:], x_loc.dtype)
        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(m + n_stages - 1)
        )
        # only the last stage's buffer holds real outputs; zero the rest
        # and psum to hand every stage (and the caller) the result
        outs = jnp.where(s == p - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, axis)
        return outs.reshape(x_loc.shape)

    batch_spec = P(batch_axis)
    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), batch_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    return shard_fn(stacked_params, x, aux)


def pipelined_encoder_apply(
    config,
    encoder_params,
    features: jnp.ndarray,
    padding_mask: jnp.ndarray,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pipe",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """The framework's ``Encoder`` forward with its layer stack pipelined.

    Numerically equivalent to ``Encoder.__call__`` (models/encoders.py) in
    eval mode: pre-stage layer_norm + sinusoid positional embedding run
    replicated (they are one fused elementwise pass), then the
    ``EncoderLayer`` stack streams microbatches over the ``pipe`` axis.

    Args:
      config: the encoder config node (``MODEL.ENCODER``: D_MODEL, LAYERS,
        SELF_ATTENTION).
      encoder_params: the encoder's param subtree
        (``params['params']['encoder']``) with ``layer_norm`` and
        ``layer_{i}`` entries.
      features, padding_mask: as ``Encoder.__call__``.
    """
    from flax import linen as nn

    from openviic_tpu.models.encoders import EncoderLayer
    from openviic_tpu.models.positional import sinusoid_positional_embedding

    out = (
        nn.LayerNorm(epsilon=1e-5).apply(
            {"params": encoder_params["layer_norm"]}, features
        )
        + sinusoid_positional_embedding(features, config.D_MODEL)
    ).astype(features.dtype)

    layer = EncoderLayer(config.SELF_ATTENTION)

    def stage_fn(layer_params, x, mask):
        return layer.apply(
            {"params": layer_params},
            queries=x, keys=x, values=x,
            padding_mask=mask, attention_mask=mask,
        )

    stacked = stack_layer_params(
        [encoder_params[f"layer_{i}"] for i in range(config.LAYERS)]
    )
    return pipeline_apply(
        stage_fn, stacked, out, padding_mask,
        mesh=mesh, microbatches=microbatches, axis=axis, batch_axis=batch_axis,
    )
