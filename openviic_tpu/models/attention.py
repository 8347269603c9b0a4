"""Attention kernels + the MultiHeadAttention wrapper.

Reference equivalents (models/modules/attentions.py):
 - ``ScaledDotProductAttention``          (attentions.py:8-58)
 - ``AugmentedGeometryScaledDotProductAttention`` (attentions.py:60-114)
 - ``AugmentedMemoryScaledDotProductAttention``   (attentions.py:116-185)
 - ``AdaptiveScaledDotProductAttention``  (attentions.py:187-268) — the
   reference computes the language-signal column with per-position Python
   loops (attentions.py:255-263); here it is one vectorised einsum.
 - ``MultiHeadAttention`` wrapper with dropout + post-LN residual and
   optional AoA gating (attentions.py:270-317).

TPU-first redesign of statefulness: the reference's ``running_keys`` /
``running_values`` buffers (attentions.py:291-302) become an explicit,
preallocated KV cache pytree threaded through decode steps.  The cache
stores *projected* K/V per position — mathematically identical to the
reference's cache-raw-then-reproject, but O(1) projection per step instead
of O(t).  Cross-attention K/V over the encoder memory is projected once per
decode (the reference reprojects every step).

All matmuls accumulate in float32 (``preferred_element_type``) so bf16
activations stay MXU-friendly without breaking argmax ties in parity mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from openviic_tpu.builders import META_ATTENTION, build_attention
from openviic_tpu.models.initializers import (
    normal_stddev,
    torch_linear_bias,
    torch_linear_kernel,
    xavier_uniform,
    zeros,
)

# A cache entry for one MultiHeadAttention: dict with
#   "k", "v": (bs, L, h, d) projected keys/values (L = max target len for
#             self-attention, or the memory length for cross-attention).
# Whether the cache is a precomputed static cross-attention K/V (never
# updated) is a *python-level* flag (``static_cache``), not a pytree leaf,
# so it stays out of scan carries.
Cache = Dict[str, Any]


def _resolve_ancestry(cache_arr: jnp.ndarray, ancestry: jnp.ndarray) -> jnp.ndarray:
    """Per-position beam-slot resolution of an unreordered decode cache.

    ``cache_arr``: (bs*beam, L, h, d) written at each beam's own slot;
    ``ancestry``: (bs, beam, L) — the slot holding position t' of each
    current beam's prefix.  Returns the view each beam should attend over,
    shaped like ``cache_arr``."""
    b_s, n_beams, L = ancestry.shape
    shaped = cache_arr.reshape((b_s, n_beams) + cache_arr.shape[1:])
    # gather over the beam axis, per position: out[b, j, t] = shaped[b, anc[b,j,t], t]
    idx = ancestry[..., None, None]  # (bs, beam, L, 1, 1)
    out = jnp.take_along_axis(shaped, idx, axis=1)
    return out.reshape(cache_arr.shape)


def _ring_dispatch(q, k, v, d_k, mask, bias):
    """Sequence-parallel path: inside a ``parallel.ring_attention`` context,
    bidirectional self-attention (nq == nk, query-independent mask) runs as
    a K/V ring over the mesh's sequence axis.  Returns None when not
    eligible (decoder causal/cached attention, per-head masks, indivisible
    lengths).

    NOTE: the context is consulted at TRACE time only, and ``jax.jit``
    caches are not keyed on it.  A function first traced outside the
    context keeps the dense path even when later called inside it (and
    vice versa) — create/trace jitted functions *inside* the context, and
    assert the taken path via ``parallel.ring_attention.DISPATCH_STATS``
    (the driver dryrun does exactly this)."""
    from openviic_tpu.parallel.ring_attention import (
        current_ring_context,
        ring_self_attention,
    )

    ctx = current_ring_context()
    if ctx is None:
        return None
    nq, nk = q.shape[1], k.shape[1]
    if (
        nq != nk
        or nq % ctx.mesh.shape[ctx.seq_axis] != 0
        or (mask is not None and mask.shape[2] != 1)
        # per-head masks (bs, h, 1, nk) cannot collapse to a key mask —
        # taking head 0 would silently drop heads 1..h-1 (ADVICE r2)
        or (mask is not None and mask.shape[1] != 1)
    ):
        return None
    key_mask = mask[:, 0, 0, :] if mask is not None else None
    attend = ring_self_attention
    if (
        getattr(ctx, "mode", "ring") == "ulysses"
        and q.shape[2] % ctx.mesh.shape[ctx.seq_axis] == 0
    ):
        # head-divisible calls take the all-to-all layout; others keep the
        # ring so the context always yields sequence-parallel execution
        from openviic_tpu.parallel.ulysses import ulysses_self_attention

        attend = ulysses_self_attention
    out = attend(
        q, k, v, ctx.mesh,
        bias=bias, key_mask=key_mask,
        seq_axis=ctx.seq_axis, batch_axis=ctx.batch_axis,
        scale=1.0 / float(d_k) ** 0.5,
    )
    # fully-masked rows: ring returns 0 (dense gives NaN); padded query
    # rows are zeroed by the callers either way (encoders.py)
    return out.astype(q.dtype)


def _attend(
    q: jnp.ndarray,  # (bs, nq, h, d_k)
    k: jnp.ndarray,  # (bs, nk, h, d_k)
    v: jnp.ndarray,  # (bs, nk, h, d_v)
    d_k: int,
    mask: Optional[jnp.ndarray],  # (bs, 1|h, nq|1, nk) True = masked
    bias: Optional[jnp.ndarray] = None,  # additive, (bs, h, nq, nk)
) -> jnp.ndarray:
    from openviic_tpu.ops import fused_attention, pallas_enabled

    ring = _ring_dispatch(q, k, v, d_k, mask, bias)
    if ring is not None:
        return ring

    if pallas_enabled():
        # mask becomes an additive -1e30 bias; fully-masked rows then give a
        # uniform distribution instead of NaN — observable outputs identical
        # (padded query rows are zeroed by the callers, encoders.py:20).
        total_bias = bias
        if mask is not None:
            mask_bias = jnp.where(mask, -1e30, 0.0)
            total_bias = mask_bias if total_bias is None else total_bias + mask_bias
        return fused_attention(q, k, v, bias=total_bias, sm_scale=1.0 / (d_k**0.5))

    att = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    att = att / jnp.sqrt(jnp.asarray(d_k, dtype=att.dtype))
    if mask is not None:
        att = jnp.where(mask, -jnp.inf, att)
    if bias is not None:
        att = att + bias
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


class _ProjectionMixin:
    """Shared q/k/v/o projections (xavier kernels, zero biases)."""

    def _dense(self, name: str, features: int) -> nn.Dense:
        return nn.Dense(features, kernel_init=xavier_uniform, bias_init=zeros, name=name)

    def setup_projections(self, d_model: int, h: int, d_k: int, d_v: int) -> None:
        self.fc_q = self._dense("fc_q", h * d_k)
        self.fc_k = self._dense("fc_k", h * d_k)
        self.fc_v = self._dense("fc_v", h * d_v)
        self.fc_o = self._dense("fc_o", d_model)

    def project_q(self, queries: jnp.ndarray) -> jnp.ndarray:
        bs, nq = queries.shape[:2]
        return self.fc_q(queries).reshape(bs, nq, self.h, self.d_k)

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bs, n = x.shape[:2]
        k = self.fc_k(x).reshape(bs, n, self.h, self.d_k)
        v = self.fc_v(x).reshape(bs, n, self.h, self.d_v)
        return k, v

    def output(self, out: jnp.ndarray) -> jnp.ndarray:
        bs, nq = out.shape[:2]
        out = self.fc_o(out.reshape(bs, nq, self.h * self.d_v))
        return out


@META_ATTENTION.register()
class ScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """Plain scaled dot-product MHA kernel (attentions.py:8-58)."""

    config: Any

    def setup(self):
        cfg = self.config
        self.d_model, self.h = cfg.D_MODEL, cfg.HEAD
        self.d_k, self.d_v = cfg.D_KEY, cfg.D_VALUE
        self.setup_projections(self.d_model, self.h, self.d_k, self.d_v)

    def __call__(self, queries, keys, values, attention_mask=None, **kwargs):
        q = self.project_q(queries)
        k = self.fc_k(keys).reshape(keys.shape[0], keys.shape[1], self.h, self.d_k)
        v = self.fc_v(values).reshape(values.shape[0], values.shape[1], self.h, self.d_v)
        out = _attend(q, k, v, self.d_k, attention_mask)
        return self.output(out)

    def attend_cached(self, queries, k, v, attention_mask, **kwargs):
        """Attention over an externally managed (cached) K/V."""
        q = self.project_q(queries)
        out = _attend(q, k, v, self.d_k, attention_mask)
        return self.output(out)

    def project_qkv_fused(self, x):
        """One matmul for q/k/v of the same input (decode hot path).

        Mathematically identical to the three separate projections; XLA
        hoists the weight concatenation out of the decode loop."""
        bs, n = x.shape[:2]
        wq, wk = self.fc_q.variables["params"], self.fc_k.variables["params"]
        wv = self.fc_v.variables["params"]
        kernel = jnp.concatenate(
            [wq["kernel"], wk["kernel"], wv["kernel"]], axis=1
        ).astype(x.dtype)
        bias = jnp.concatenate([wq["bias"], wk["bias"], wv["bias"]]).astype(x.dtype)
        qkv = (
            jnp.einsum("bnd,df->bnf", x, kernel, preferred_element_type=jnp.float32)
            .astype(x.dtype)
            + bias
        )
        hk = self.h * self.d_k
        q = qkv[..., :hk].reshape(bs, n, self.h, self.d_k)
        k = qkv[..., hk : 2 * hk].reshape(bs, n, self.h, self.d_k)
        v = qkv[..., 2 * hk :].reshape(bs, n, self.h, self.d_v)
        return q, k, v

    def attend_projected(self, q, k, v, attention_mask):
        out = _attend(q, k, v, self.d_k, attention_mask)
        return self.output(out)

    # -- beam-resident decode (no physical beam reorder) -----------------
    def attend_projected_beam_select(
        self, q_t, k, v, ancestry, position_mask, mask_axis: str = "q",
        use_kernel: bool = False,
    ):
        """Self-attention decode step over *all* beams' unreordered caches.

        Replaces gather-reorder + attend (the reference's
        ``apply_to_states`` at beam_search.py:61 and our
        ``_gather_beams``): scores are computed against every beam slot's
        cache of the same image and the true ancestor is selected with an
        ancestry one-hot mask inside the softmax.  The multi-MB cache is
        read once and never rewritten; the extra score FLOPs
        (beam× more) are noise next to the MXU's capacity.

        q_t: (bs*beam, 1, h, d_k) this step's queries;
        k/v: (bs*beam, L, h, d) append-only caches (each beam writes its
             own slot);
        ancestry: (bs, beam, L) — the slot holding position t' of each
             current beam's prefix;
        position_mask: (bs*beam, 1, 1, L) bool, True = masked.  With
             ``mask_axis='q'`` the mask is already ancestry-resolved per
             current beam; with ``mask_axis='p'`` it is the *raw* per-slot
             mask (pad written at each slot's own row) and is applied on
             the slot axis — equivalent because position (q, t') only
             survives at slot p = ancestry[q, t'], and saves the
             take_along_axis pad resolve (a slow per-element gather on
             TPU).

        Layout note: a (bs, h, q, slot*L)-score variant (joint
        slot-position axis on the 128-wide lanes, head-batched
        dot_generals) measures 21% faster *standalone*, but in the decode
        loop the caches are while-carries with pinned layouts, so the
        required transposes relayout the multi-MB caches every step and
        the bench halves (measured round 3).  The einsum form below lets
        XLA keep the carry layout; the lane-friendly layout win is
        instead realised by the fused Pallas step kernel
        (ops/beam_select_attention.py, ``use_kernel=True`` — threaded from
        ``beam_search(attn_kernel=...)`` / ``TRAINING.DECODE_ATTN_KERNEL``)."""
        if use_kernel:
            from openviic_tpu.ops.beam_select_attention import (
                beam_select_attention,
            )

            out = beam_select_attention(
                q_t, k, v, ancestry, position_mask, mask_axis=mask_axis
            )
            return self.output(out)
        b_s, n_beams, L = ancestry.shape
        h, d_k = q_t.shape[2], q_t.shape[3]
        qb = q_t.reshape(b_s, n_beams, h, d_k)
        kb = k.reshape(b_s, n_beams, L, h, self.d_k)
        vb = v.reshape(b_s, n_beams, L, h, self.d_v)

        att = jnp.einsum(
            "bqhd,bpLhd->bqpLh", qb, kb, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(self.d_k, jnp.float32))
        onehot = (
            ancestry[:, :, None, :]
            == jnp.arange(n_beams, dtype=ancestry.dtype)[None, None, :, None]
        )  # (bs, q, p, L)
        if mask_axis == "p":
            not_masked = ~position_mask.reshape(b_s, 1, n_beams, L)
        else:
            not_masked = ~position_mask.reshape(b_s, n_beams, 1, L)
        live = jnp.logical_and(onehot, not_masked)
        att = jnp.where(live[..., None], att, -jnp.inf)
        # exactly one live slot per (q, position): softmax over the joint
        # (slot, position) axis equals softmax over the resolved positions
        att = jax.nn.softmax(att.reshape(b_s, n_beams, n_beams * L, h), axis=2)
        att = att.reshape(b_s, n_beams, n_beams, L, h)
        out = jnp.einsum(
            "bqpLh,bpLhd->bqhd", att, vb, preferred_element_type=jnp.float32
        ).astype(q_t.dtype)
        return self.output(out.reshape(b_s * n_beams, 1, h, self.d_v))

    def attend_cached_grouped(self, queries, k, v, attention_mask, n_beams: int):
        """Cross-attention with K/V kept at image granularity.

        The encoder memory's K/V is identical across a beam group — the
        reference (and the default path) expand it beam-wise; here the
        beams of one image attend to one shared copy, cutting the
        cross-cache HBM traffic by the beam factor and turning beam
        mat-vecs into small matmuls.

        queries: (bs*beam, 1, d_model); k/v: (bs, M, h, d);
        attention_mask: (bs, 1, 1, M) True = masked.

        (A head-batched dot_general variant with M on the lane axis was
        measured round 3 and LOST in-loop — the k/v transposes are not
        hoisted out of the decode while-loop, so they relayout the cross
        cache every step.  The einsum form keeps the stored layout.)"""
        b_s, M = k.shape[0], k.shape[1]
        q = self.project_q(queries).reshape(b_s, n_beams, self.h, self.d_k)
        att = jnp.einsum(
            "bqhd,bMhd->bqMh", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(self.d_k, jnp.float32))
        if attention_mask is not None:
            att = jnp.where(
                attention_mask.reshape(b_s, 1, M, 1), -jnp.inf, att
            )
        att = jax.nn.softmax(att, axis=2)
        out = jnp.einsum(
            "bqMh,bMhd->bqhd", att, v, preferred_element_type=jnp.float32
        ).astype(queries.dtype)
        return self.output(out.reshape(b_s * n_beams, 1, self.h, self.d_v))


@META_ATTENTION.register()
class AugmentedGeometryScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """SDPA + log-ReLU geometric bias (attentions.py:60-114).

    ``relative_geometry_weights``: (bs, h, nq, nk) non-negative weights;
    the bias added before softmax is log(clamp(g, 1e-6))."""

    config: Any

    def setup(self):
        cfg = self.config
        self.d_model, self.h = cfg.D_MODEL, cfg.HEAD
        self.d_k, self.d_v = cfg.D_KEY, cfg.D_VALUE
        self.setup_projections(self.d_model, self.h, self.d_k, self.d_v)

    def __call__(
        self, queries, keys, values, relative_geometry_weights=None,
        attention_mask=None, geometry_fused=None, **kwargs,
    ):
        q = self.project_q(queries)
        k, v = self.project_kv(keys)
        if geometry_fused is not None:
            # bias computed in-kernel from the raw boxes
            # (ops/geo_attention.py) — never materialises (bs, h, n, n)
            from openviic_tpu.ops.geo_attention import geo_fused_attention

            out = geo_fused_attention(
                q, k, v,
                geometry_fused["boxes"],
                geometry_fused["kernel"],
                geometry_fused["bias"],
                attention_mask,
                sm_scale=1.0 / (self.d_k**0.5),
            ).astype(queries.dtype)
            return self.output(out)
        bias = jnp.log(jnp.clip(relative_geometry_weights, min=1e-6))
        out = _attend(q, k, v, self.d_k, attention_mask, bias=bias)
        return self.output(out)


@META_ATTENTION.register()
class AugmentedMemoryScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """SDPA with learnable memory slots appended to K/V (attentions.py:116-185).

    The M memory slots are treated as an unmasked K/V suffix: the padding
    mask only covers the first nk columns (attentions.py:180)."""

    config: Any

    def setup(self):
        cfg = self.config
        self.d_model, self.h = cfg.D_MODEL, cfg.HEAD
        self.d_k, self.d_v = cfg.D_KEY, cfg.D_VALUE
        self.m = cfg.MEMORY
        self.setup_projections(self.d_model, self.h, self.d_k, self.d_v)
        self.m_k = self.param(
            "m_k", normal_stddev(1.0 / self.d_k), (1, self.m, self.h * self.d_k)
        )
        self.m_v = self.param(
            "m_v", normal_stddev(1.0 / self.m), (1, self.m, self.h * self.d_v)
        )

    def __call__(self, queries, keys, values, attention_mask=None, **kwargs):
        bs, nq = queries.shape[:2]
        nk = keys.shape[1]

        m_k = jnp.sqrt(jnp.asarray(self.d_k, jnp.float32)) * self.m_k
        m_v = jnp.sqrt(jnp.asarray(self.m, jnp.float32)) * self.m_v
        m_k = jnp.broadcast_to(m_k, (bs, self.m, self.h * self.d_k))
        m_v = jnp.broadcast_to(m_v, (bs, self.m, self.h * self.d_v))

        q = self.project_q(queries)
        k = jnp.concatenate([self.fc_k(keys), m_k], axis=1).reshape(
            bs, nk + self.m, self.h, self.d_k
        )
        v = jnp.concatenate([self.fc_v(values), m_v], axis=1).reshape(
            bs, nk + self.m, self.h, self.d_v
        )

        if attention_mask is not None:
            # memory columns are never masked (attentions.py:180)
            mem_cols = jnp.zeros(
                attention_mask.shape[:-1] + (self.m,), dtype=attention_mask.dtype
            )
            attention_mask = jnp.concatenate([attention_mask, mem_cols], axis=-1)

        out = _attend(q, k, v, self.d_k, attention_mask)
        return self.output(out)


@META_ATTENTION.register()
class AdaptiveScaledDotProductAttention(nn.Module, _ProjectionMixin):
    """RSTNet adaptive attention (attentions.py:187-268), vectorised.

    Each query position i gets one extra K/V column derived from its own
    language signal s_i; the reference materialises this with Python loops
    over positions (attentions.py:255-263).  Here: the extra logit is the
    diagonal of q·s^T and the extra value row is s_i itself, computed with
    two einsums and one concat."""

    config: Any

    def setup(self):
        cfg = self.config
        self.d_model, self.h = cfg.D_MODEL, cfg.HEAD
        self.d_k, self.d_v = cfg.D_KEY, cfg.D_VALUE
        self.setup_projections(self.d_model, self.h, self.d_k, self.d_v)
        self.fc_s = self._dense("fc_s", self.h * self.d_k)

    def __call__(
        self, queries, keys, values, language_signals, attention_mask=None, **kwargs
    ):
        bs, nq = queries.shape[:2]
        nk = keys.shape[1]

        q = self.project_q(queries)  # (bs, nq, h, d_k)
        s = self.fc_s(language_signals).reshape(bs, nq, self.h, self.d_k)
        k, v = self.project_kv(keys)

        scale = jnp.sqrt(jnp.asarray(self.d_k, jnp.float32))
        attn = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            / scale
        )
        if attention_mask is not None:
            attn = jnp.where(attention_mask, -jnp.inf, attn)

        # language column: logit_i = q_i . s_i / sqrt(d_k) (the diagonal of
        # q s^T in the reference, attentions.py:254-255)
        lang_attn = (
            jnp.einsum("bqhd,bqhd->bhq", q, s, preferred_element_type=jnp.float32)
            / scale
        )
        combined = jnp.concatenate([attn, lang_attn[..., None]], axis=-1)
        combined = jax.nn.softmax(combined, axis=-1)  # (bs, h, nq, nk+1)

        out = jnp.einsum(
            "bhqk,bkhd->bqhd", combined[..., :nk], v,
            preferred_element_type=jnp.float32,
        )
        # extra value row for query i is s_i (attentions.py:260-263)
        out = out + combined[..., -1].transpose(0, 2, 1)[..., None] * s
        return self.output(out.astype(queries.dtype))

    def attend_cached(self, queries, k, v, attention_mask, language_signals=None,
                      **kwargs):
        """Cached-KV variant: queries/language_signals are the current step."""
        bs, nq = queries.shape[:2]
        nk = k.shape[1]
        q = self.project_q(queries)
        s = self.fc_s(language_signals).reshape(bs, nq, self.h, self.d_k)

        scale = jnp.sqrt(jnp.asarray(self.d_k, jnp.float32))
        attn = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            / scale
        )
        if attention_mask is not None:
            attn = jnp.where(attention_mask, -jnp.inf, attn)
        lang_attn = (
            jnp.einsum("bqhd,bqhd->bhq", q, s, preferred_element_type=jnp.float32)
            / scale
        )
        combined = jnp.concatenate([attn, lang_attn[..., None]], axis=-1)
        combined = jax.nn.softmax(combined, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", combined[..., :nk], v,
            preferred_element_type=jnp.float32,
        )
        out = out + combined[..., -1].transpose(0, 2, 1)[..., None] * s
        return self.output(out.astype(queries.dtype))


class MultiHeadAttention(nn.Module):
    """Kernel wrapper: dropout + post-LN residual + optional AoA gating.

    Matches attentions.py:270-317.  The decode-time KV cache is explicit:
    ``__call__(..., cache=...)`` returns ``(out, new_cache)``; without a
    cache it returns just ``out``.
    """

    config: Any

    def setup(self):
        cfg = self.config
        d_model = cfg.D_MODEL
        self.use_aoa = cfg.USE_AOA
        self.can_be_stateful = cfg.CAN_BE_STATEFUL
        if self.use_aoa:
            self.informative_attention = nn.Dense(
                d_model,
                kernel_init=torch_linear_kernel,
                bias_init=torch_linear_bias(2 * d_model),
                name="informative_attention",
            )
            self.gated_attention = nn.Dense(
                d_model,
                kernel_init=torch_linear_kernel,
                bias_init=torch_linear_bias(2 * d_model),
                name="gated_attention",
            )
        self.attention = build_attention(cfg)
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")

    def _finish(self, queries, out, train: bool):
        out = self.dropout(out, deterministic=not train)
        out = self.layer_norm(queries + out).astype(queries.dtype)
        if self.use_aoa:
            aoa_input = jnp.concatenate([queries, out], axis=-1)
            i = self.informative_attention(aoa_input)
            g = jax.nn.sigmoid(self.gated_attention(aoa_input))
            out = i * g
        return out

    def __call__(
        self,
        queries,
        keys,
        values,
        padding_mask=None,
        attention_mask=None,
        cache: Optional[Cache] = None,
        decode_index: Optional[jnp.ndarray] = None,
        static_cache: bool = False,
        train: bool = False,
        ancestry: Optional[jnp.ndarray] = None,
        beam_select: Optional[int] = None,
        mask_axis: str = "q",
        attn_kernel: bool = False,
        **kwargs,
    ):
        if cache is None:
            out = self.attention(
                queries, keys, values, attention_mask=attention_mask, **kwargs
            )
            return self._finish(queries, out, train)

        # --- cached decode path ----------------------------------------
        if static_cache:
            # cross-attention: K/V precomputed over encoder memory
            if (
                beam_select is not None
                and cache["k"].shape[0] != queries.shape[0]
                and hasattr(self.attention, "attend_cached_grouped")
                and not kwargs
            ):
                out = self.attention.attend_cached_grouped(
                    queries, cache["k"], cache["v"], attention_mask, beam_select
                )
            else:
                out = self.attention.attend_cached(
                    queries, cache["k"], cache["v"], attention_mask, **kwargs
                )
            return self._finish(queries, out, train), cache

        # self-attention: write this step's projected K/V at decode_index.
        # With `ancestry` (bs, beam, L) the cache is never physically
        # reordered on beam selection; each read resolves position t''s
        # true slot through the ancestry table instead (lazy beam reorder —
        # the big gather then sits in the same loop iteration as the
        # attention that consumes it).
        if hasattr(self.attention, "project_qkv_fused") and not kwargs:
            q_t, k_t, v_t = self.attention.project_qkv_fused(queries)
        else:
            q_t = None
            k_t, v_t = self.attention.project_kv(keys)  # (bs, 1, h, d)
        k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k_t, decode_index, axis=1)
        v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v_t, decode_index, axis=1)
        if (
            beam_select is not None
            and ancestry is not None
            and q_t is not None
            and hasattr(self.attention, "attend_projected_beam_select")
        ):
            # beam-resident: no gather at all — scores against every slot's
            # cache, ancestry one-hot selection inside the softmax
            out = self.attention.attend_projected_beam_select(
                q_t, k, v, ancestry, attention_mask, mask_axis=mask_axis,
                use_kernel=attn_kernel and type(self.attention).__name__
                == "ScaledDotProductAttention",
            )
            return self._finish(queries, out, train), {"k": k, "v": v}
        k_read, v_read = k, v
        if ancestry is not None:
            k_read = _resolve_ancestry(k, ancestry)
            v_read = _resolve_ancestry(v, ancestry)
        if q_t is not None:
            out = self.attention.attend_projected(q_t, k_read, v_read, attention_mask)
        else:
            out = self.attention.attend_cached(
                queries, k_read, v_read, attention_mask, **kwargs
            )
        new_cache = {"k": k, "v": v}
        return self._finish(queries, out, train), new_cache

    def make_cache(self, batch_size: int, length: int) -> Cache:
        cfg = self.config
        return {
            "k": jnp.zeros((batch_size, length, cfg.HEAD, cfg.D_KEY)),
            "v": jnp.zeros((batch_size, length, cfg.HEAD, cfg.D_VALUE)),
        }

    def precompute_cache(self, memory: jnp.ndarray) -> Cache:
        """Project cross-attention K/V over the encoder memory once."""
        k, v = self.attention.project_kv(memory)
        return {"k": k, "v": v, "static": True}
