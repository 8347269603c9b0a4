"""Sequence-parallel ring attention over a mesh axis.

The reference materialises full (nq x nk) attention matrices on one GPU
(reference: models/modules/attentions.py:44-58) and has no notion of
sequence parallelism (SURVEY.md §2.2 SP/CP row: absent).  Caption-scale
sequences (<= ~100 tokens) never need it; this module is the scale-out
path for high-resolution grid features (784+ tokens per image at 28x28,
more for multi-scale pyramids), where the O(n^2) score/bias tensors stop
fitting per-device HBM.

Design (the blockwise/ring pattern): the sequence axis is sharded over a
mesh axis; every device keeps its Q shard resident and the K/V shards
rotate around the ring via ``jax.lax.ppermute`` — P steps for P devices,
each step contracting the local Q block against one visiting K/V block
with a numerically-stable *online softmax* (running max + running sum in
f32, the flash-attention recurrence).  Peak memory per device is
O(n_local * n_local) scores instead of O(n^2), and the P2P transfers ride
the ICI ring, never materialising the full sequence anywhere.

Additive-bias support mirrors the framework's geometric attention (ORT/
DLCT, models/geometry.py): the bias is passed sharded on the *query* axis
(each device holds its (b, h, n_local, n_global) row block) and the
columns for the visiting K block are sliced per ring step, so the
quadratic bias also never exists in full on any device.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class RingContext(NamedTuple):
    mesh: Mesh
    seq_axis: str
    batch_axis: Optional[str]
    #: "ring" (K/V ppermute ring) or "ulysses" (all-to-all head sharding,
    #: parallel/ulysses.py) — which sequence-parallel layout to dispatch to
    mode: str = "ring"


_RING_CTX: contextvars.ContextVar[Optional[RingContext]] = contextvars.ContextVar(
    "openviic_ring_attention_ctx", default=None
)


def current_ring_context() -> Optional[RingContext]:
    return _RING_CTX.get()


#: incremented each time ``ring_self_attention`` is traced (see its body)
DISPATCH_STATS = {"traces": 0}


@contextlib.contextmanager
def ring_attention(mesh: Mesh, seq_axis: str = "seq",
                   batch_axis: Optional[str] = None,
                   mode: str = "ring"):
    """Route eligible encoder self-attention through a sequence-parallel
    attention layout.

    Inside this context, the framework's attention kernels
    (models/attention.py ``_attend``) dispatch bidirectional self-attention
    (nq == nk, query-independent mask) to ``ring_self_attention`` (or, with
    ``mode="ulysses"``, to ``parallel.ulysses.ulysses_self_attention``)
    over ``mesh``'s ``seq_axis`` — making every encoder (incl. the
    geometric-bias ORT/DLCT ones) sequence-parallel without touching model
    code:

        with ring_attention(mesh, "seq"):
            out = jax.jit(model.apply, ...)(params, batch)

    Decoder attention (causal masks, cached K/V) is unaffected.  Under
    ``mode="ulysses"``, calls whose head count does not divide the seq
    axis fall back to the ring layout (still sequence-parallel)."""
    if mode not in ("ring", "ulysses"):
        raise ValueError(f"unknown sequence-parallel mode {mode!r}")
    token = _RING_CTX.set(RingContext(mesh, seq_axis, batch_axis, mode))
    try:
        yield
    finally:
        _RING_CTX.reset(token)


def _ring_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    key_mask: Optional[jnp.ndarray],
    axis_name: str,
    scale: float,
):
    """Per-device body (runs under shard_map).

    q, k, v: (b, n_local, h, d) shards; bias: (b, h, n_local, n_global) row
    block or None; key_mask: (b, n_global) bool, True = masked, or None.
    """
    n_devices = jax.lax.psum(1, axis_name)
    my_index = jax.lax.axis_index(axis_name)
    b, n_local, h, d = q.shape
    dv = v.shape[-1]

    qh = jnp.swapaxes(q, 1, 2)  # (b, h, n_local, d)

    m = jnp.full((b, h, n_local), -jnp.inf, jnp.float32)  # running max
    l = jnp.zeros((b, h, n_local), jnp.float32)  # running sum
    acc = jnp.zeros((b, h, n_local, dv), jnp.float32)

    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    def body(step, carry):
        m, l, acc, k_blk, v_blk = carry
        # after `step` rotations this device holds the shard that started
        # on device (my_index - step) mod n_devices
        src = (my_index - step) % n_devices

        kh = jnp.swapaxes(k_blk, 1, 2)  # (b, h, n_local, d)
        vh = jnp.swapaxes(v_blk, 1, 2)
        s = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh,
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if bias is not None:
            cols = jax.lax.dynamic_slice_in_dim(
                bias, src * n_local, n_local, axis=3
            )
            s = s + cols.astype(jnp.float32)
        if key_mask is not None:
            mask_cols = jax.lax.dynamic_slice_in_dim(
                key_mask, src * n_local, n_local, axis=1
            )
            s = jnp.where(mask_cols[:, None, None, :], -jnp.inf, s)

        # online softmax update (flash recurrence)
        blk_max = jnp.max(s, axis=-1)
        new_m = jnp.maximum(m, blk_max)
        # fully-masked rows so far: keep exp well-defined
        safe_m = jnp.where(jnp.isneginf(new_m), 0.0, new_m)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(jnp.isneginf(s), 0.0, p)
        correction = jnp.where(
            jnp.isneginf(m), 0.0, jnp.exp(m - safe_m)
        )
        new_l = l * correction + jnp.sum(p, axis=-1)
        new_acc = acc * correction[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vh.astype(jnp.float32)
        )

        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return new_m, new_l, new_acc, k_blk, v_blk

    m, l, acc, _, _ = jax.lax.fori_loop(0, n_devices, body, (m, l, acc, k, v))

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)  # (b, n_local, h, dv)


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Bidirectional self-attention, sequence-sharded over ``seq_axis``.

    Args:
      q, k, v: (batch, n, heads, head_dim) — ``n`` must divide evenly by
        the ``seq_axis`` size.
      mesh: mesh containing ``seq_axis`` (and optionally ``batch_axis``
        for combined data+sequence parallelism).
      bias: optional additive attention bias (batch, heads, n, n) — e.g.
        the ORT/DLCT geometric bias.  Sharded on the query axis only.
      key_mask: optional (batch, n) bool, True = masked key position.
      scale: score scale; default 1/sqrt(head_dim).

    Returns (batch, n, heads, head_dim_v), fp-accumulated in f32.
    """
    # trace-time dispatch counter: lets callers (e.g. the multi-chip
    # dryrun) assert the ring path was actually taken rather than a dense
    # fallback having silently served the shapes
    DISPATCH_STATS["traces"] += 1
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    n = q.shape[1]
    n_shards = mesh.shape[seq_axis]
    if n % n_shards != 0:
        raise ValueError(
            f"sequence length {n} not divisible by mesh axis "
            f"'{seq_axis}' of size {n_shards}"
        )

    ba = batch_axis
    qkv_spec = P(ba, seq_axis, None, None)
    bias_spec = P(ba, None, seq_axis, None)
    mask_spec = P(ba, None)

    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    # shard_map wants concrete specs per arg; None args handled via closure
    fn = functools.partial(
        _ring_attention_local, axis_name=seq_axis, scale=scale
    )

    if bias is not None and key_mask is not None:
        body = lambda q, k, v, b, km: fn(q, k, v, b, km)
        in_specs += [bias_spec, mask_spec]
        args += [bias, key_mask]
    elif bias is not None:
        body = lambda q, k, v, b: fn(q, k, v, b, None)
        in_specs += [bias_spec]
        args += [bias]
    elif key_mask is not None:
        body = lambda q, k, v, km: fn(q, k, v, None, km)
        in_specs += [mask_spec]
        args += [key_mask]
    else:
        body = lambda q, k, v: fn(q, k, v, None, None)

    shard_fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return shard_fn(*args)
