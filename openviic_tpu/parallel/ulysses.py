"""Ulysses-style sequence parallelism: all-to-all head-sharded attention.

The second of the two standard sequence-parallel attention layouts (the
first, the K/V ring, lives in ``parallel/ring_attention.py``).  The
reference has no sequence parallelism at all (SURVEY.md §2.2; it
materialises the full (nq x nk) score matrix on one GPU —
reference: models/modules/attentions.py:44-58); both layouts here are the
TPU scale-out path for long visual sequences.

Layout: activations arrive sequence-sharded (each of the P devices on the
mesh's ``seq`` axis holds n/P positions of Q/K/V).  One ``all_to_all``
re-shards them head-wise — every device ends up with the FULL sequence
for h/P of the heads — attention runs as a plain dense kernel locally
(heads are embarrassingly parallel), and a second ``all_to_all`` restores
the sequence sharding.  Cost: two all-to-alls of the activations per
attention call, vs the ring's P ppermute rounds of K/V.

Trade-offs vs the ring (why both exist):
  * Ulysses does ONE dense attention per device — better MXU utilisation
    and no P-step serial dependency; the all-to-alls ride ICI and overlap
    poorly only when h/P is small.
  * Ulysses holds a full (b, h/P, n, n) score block per device, so peak
    memory falls only with the head count, not with the sequence — the
    ring stays O(n_local^2) and wins at extreme lengths.
  * Ulysses needs heads % P == 0; the ring needs n % P == 0 only.

Additive-bias support mirrors the ring: the (b, h, n, n) bias enters
query-row-sharded (P(ba, None, seq, None)) and is all-to-all'd to
head-sharded (b, h/P, n, n) — the full quadratic bias per head group is
inherent to this layout (documented above as the memory trade-off).

Dispatch: ``parallel.ring_attention.ring_attention(mesh, mode="ulysses")``
routes eligible encoder self-attention here via the same context used for
the ring (models/attention.py ``_ring_dispatch``); calls whose head count
does not divide the mesh axis fall back to the ring so the context always
guarantees sequence-parallel execution.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


#: incremented each time ``ulysses_self_attention`` is traced (the
#: multi-chip dryrun asserts the taken path, same as the ring's counter)
DISPATCH_STATS = {"traces": 0}


@contextlib.contextmanager
def ulysses_attention(mesh: Mesh, seq_axis: str = "seq",
                      batch_axis: Optional[str] = None):
    """Route eligible encoder self-attention through the Ulysses layout.

    Sugar for ``ring_attention(mesh, seq_axis, batch_axis, mode="ulysses")``
    — see that context manager (and its trace-time-dispatch caveat) in
    ``parallel/ring_attention.py``."""
    from openviic_tpu.parallel.ring_attention import ring_attention

    with ring_attention(mesh, seq_axis, batch_axis, mode="ulysses"):
        yield


def _safe_softmax_attend(qh, kh, vh, bias, key_mask, scale):
    """Dense f32-accumulated attention on (b, hp, n, d) head-sharded blocks.

    Same fully-masked-row convention as the ring kernel: rows whose every
    key is masked return 0 (dense softmax would give NaN); padded query
    rows are zeroed by the encoder callers either way (encoders.py)."""
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
        * scale
    )
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], -jnp.inf, s)
    m = jnp.max(s, axis=-1)
    safe_m = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s - safe_m[..., None])
    p = jnp.where(jnp.isneginf(s), 0.0, p)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh.astype(jnp.float32))
    return out / jnp.maximum(l, 1e-30)[..., None]


def _ulysses_local(q, k, v, bias, key_mask, axis_name, scale):
    """Per-device body (runs under shard_map).

    q, k, v: (b, n_local, h, d) sequence shards; bias: (b, h, n_local, n)
    query-row block or None; key_mask: (b, n) bool (replicated on the seq
    axis), True = masked, or None.
    """
    # seq-sharded -> head-sharded: split heads (axis 2) across the axis,
    # gather the full sequence (axis 1): (b, n_local, h, d) -> (b, n, h/P, d)
    a2a_fwd = functools.partial(
        jax.lax.all_to_all, axis_name=axis_name,
        split_axis=2, concat_axis=1, tiled=True,
    )
    qg = a2a_fwd(q)
    kg = a2a_fwd(k)
    vg = a2a_fwd(v)

    qh = jnp.swapaxes(qg, 1, 2).astype(jnp.float32)  # (b, h/P, n, d)
    kh = jnp.swapaxes(kg, 1, 2).astype(jnp.float32)
    vh = jnp.swapaxes(vg, 1, 2)

    if bias is not None:
        # (b, h, n_local, n) query-row block -> (b, h/P, n, n) head block
        bias = jax.lax.all_to_all(
            bias, axis_name=axis_name, split_axis=1, concat_axis=2,
            tiled=True,
        )

    out = _safe_softmax_attend(qh, kh, vh, bias, key_mask, scale)
    out = jnp.swapaxes(out, 1, 2).astype(q.dtype)  # (b, n, h/P, dv)

    # head-sharded -> seq-sharded: (b, n, h/P, dv) -> (b, n_local, h, dv)
    return jax.lax.all_to_all(
        out, axis_name=axis_name, split_axis=1, concat_axis=2, tiled=True
    )


def ulysses_self_attention(
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
    """Bidirectional self-attention, sequence-sharded over ``seq_axis``,
    computed head-sharded via two all-to-alls (DeepSpeed-Ulysses layout).

    Args:
      q, k, v: (batch, n, heads, head_dim) — ``n`` AND ``heads`` must both
        divide evenly by the ``seq_axis`` size.
      mesh: mesh containing ``seq_axis`` (and optionally ``batch_axis``).
      bias: optional additive attention bias (batch, heads, n, n) — e.g.
        the ORT/DLCT geometric bias.  Enters query-row-sharded.
      key_mask: optional (batch, n) bool, True = masked key position.
      scale: score scale; default 1/sqrt(head_dim).

    Returns (batch, n, heads, head_dim_v), f32-accumulated.  Token-level
    semantics identical to the dense path and to ``ring_self_attention``
    (incl. zeros for fully-masked rows).
    """
    DISPATCH_STATS["traces"] += 1
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    n, h = q.shape[1], q.shape[2]
    n_shards = mesh.shape[seq_axis]
    if n % n_shards != 0:
        raise ValueError(
            f"sequence length {n} not divisible by mesh axis "
            f"'{seq_axis}' of size {n_shards}"
        )
    if h % n_shards != 0:
        raise ValueError(
            f"head count {h} not divisible by mesh axis "
            f"'{seq_axis}' of size {n_shards} (use the ring layout)"
        )

    ba = batch_axis
    qkv_spec = P(ba, seq_axis, None, None)
    bias_spec = P(ba, None, seq_axis, None)
    mask_spec = P(ba, None)

    fn = functools.partial(_ulysses_local, axis_name=seq_axis, scale=scale)

    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
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
