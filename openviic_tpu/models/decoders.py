"""Caption decoders.

Reference equivalents (models/modules/decoders.py):
 - ``Decoder``        (decoders.py:75-123): word emb + frozen sinusoid pos
   table, N x (masked self-attn + cross-attn + FFN), tied-free Linear to
   vocab, log_softmax.
 - ``MeshedDecoder``  (decoders.py:125-173): cross-attends each of the N
   encoder levels with sigmoid-gated fc_alpha fusion averaged by sqrt(N).
 - ``AdaptiveDecoder``(decoders.py:175-230): N+1 layers, the last driven by
   language signals from a frozen pretrained LM (RSTNet).  Unbuildable in
   the reference (builder typo + empty registry — SURVEY.md §2.5#1); built
   *fixed* here.

TPU-first decode: the reference's stateful-buffer machinery
(``register_state`` / ``statefulness`` / ``apply_to_states``,
models/modules/containers.py) is replaced by an explicit **DecodeCache
pytree**: preallocated per-layer projected KV buffers + a running
token-was-pad mask, threaded through a jitted ``lax.scan``.  Semantics
match the reference exactly:

 - self-attention at step t masks cached positions j where j > t or
   token_j was <pad> (the reference's ``running_mask_self_attention``
   concat at decoders.py:101-103 flags pad tokens per step);
 - the positional index at step t is t+1 regardless of pad status
   (``running_seq.add_(1)`` at decoders.py:107-109);
 - cross-attention K/V over the encoder memory is projected once per decode
   instead of per step (mathematically identical).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from openviic_tpu.builders import (
    META_DECODER,
    build_pretrained_language_model,
    build_text_embedding,
)
from openviic_tpu.models.attention import MultiHeadAttention
from openviic_tpu.models.ffn import make_pwff
from openviic_tpu.models.initializers import torch_linear_kernel, xavier_uniform, zeros
from openviic_tpu.models.masks import generate_padding_mask, generate_sequential_mask
from openviic_tpu.models.positional import sinusoid_encoding_table

DecodeCache = Dict[str, Any]


class DecoderLayer(nn.Module):
    """Masked self-attn + cross-attn + FFN (decoders.py:13-28)."""

    config: Any

    def setup(self):
        self.self_attn = MultiHeadAttention(self.config.SELF_ATTENTION, name="self_attn")
        self.enc_attn = MultiHeadAttention(self.config.ENC_ATTENTION, name="enc_attn")
        self.pwff = make_pwff(self.config.ENC_ATTENTION, name="pwff")

    def __call__(self, queries, keys, values, self_padding_mask, self_attention_mask,
                 enc_attention_mask, train: bool = False, **kwargs):
        self_att = self.self_attn(
            queries, queries, queries,
            padding_mask=self_padding_mask, attention_mask=self_attention_mask,
            train=train, **kwargs,
        )
        enc_att = self.enc_attn(
            self_att, keys, values,
            padding_mask=self_padding_mask, attention_mask=enc_attention_mask,
            train=train, **kwargs,
        )
        ff = self.pwff(enc_att, train=train)
        ff = jnp.where(self_padding_mask[:, 0, 0, :, None], 0.0, ff)
        return ff

    def prepare_cache(self, memory: jnp.ndarray) -> DecodeCache:
        return {"cross": self.enc_attn.precompute_cache(memory)}

    def step(self, queries, layer_cache, decode_index, self_attention_mask,
             enc_attention_mask, ancestry=None, resident_kernel=False,
             is_pad_t=None, train: bool = False, **kwargs):
        # ``train=True`` activates dropout during step decoding (SCST
        # sampling parity: the reference beam-searches under model.train(),
        # vi_trainer.py:126-132).  The fused Pallas step kernels do not
        # implement dropout, so they are bypassed in that mode.
        if (not train and resident_kernel
                and self._can_resident_step(kwargs, ancestry, is_pad_t)):
            return self._resident_step(
                queries, layer_cache, decode_index, self_attention_mask,
                enc_attention_mask, ancestry, is_pad_t,
                kwargs["beam_select"],
            )
        if not train and self._can_fuse_step(kwargs, ancestry):
            return self._fused_step(
                queries, layer_cache, decode_index,
                self_attention_mask, enc_attention_mask,
            )
        self_att, self_cache = self.self_attn(
            queries, queries, queries,
            attention_mask=self_attention_mask,
            cache=layer_cache["self"], decode_index=decode_index,
            ancestry=ancestry, train=train, **kwargs,
        )
        enc_att, _ = self.enc_attn(
            self_att, None, None,
            attention_mask=enc_attention_mask,
            cache=layer_cache["cross"], static_cache=True, train=train,
            **kwargs,
        )
        ff = self.pwff(enc_att, train=train)
        new_cache = dict(layer_cache)
        new_cache["self"] = self_cache
        return ff, new_cache

    # -- beam-resident fused layer step (ops/resident_layer_step.py) -----
    def _can_resident_step(self, kwargs, ancestry, is_pad_t) -> bool:
        return (
            ancestry is not None
            and is_pad_t is not None
            and kwargs.get("beam_select") is not None
            and set(kwargs) <= {"beam_select", "mask_axis"}
            and type(self.self_attn.attention).__name__ == "ScaledDotProductAttention"
            and type(self.enc_attn.attention).__name__ == "ScaledDotProductAttention"
            and not self.self_attn.use_aoa
            and not self.enc_attn.use_aoa
        )

    def _resident_step(self, queries, layer_cache, decode_index,
                       self_attention_mask, enc_attention_mask, ancestry,
                       is_pad_t, beam):
        from openviic_tpu.ops.resident_layer_step import resident_layer_step

        sc, cc = layer_cache["self"], layer_cache["cross"]
        y, k_new, v_new = resident_layer_step(
            queries,
            sc["k"], sc["v"],
            cc["k"], cc["v"],
            ancestry,
            self_attention_mask,
            enc_attention_mask,
            is_pad_t,
            jnp.asarray(decode_index),
            self._fused_weights(),
            n_heads=sc["k"].shape[2],
        )
        k = jax.lax.dynamic_update_slice_in_dim(
            sc["k"], k_new[:, None], decode_index, axis=1
        )
        v = jax.lax.dynamic_update_slice_in_dim(
            sc["v"], v_new[:, None], decode_index, axis=1
        )
        return y, {"cross": cc, "self": {"k": k, "v": v}}

    # -- fused single-kernel step (OPENVIIC_FUSED_STEP=1) ----------------
    def _can_fuse_step(self, kwargs, ancestry) -> bool:
        from openviic_tpu.ops.fused_decoder_step import fused_step_enabled

        return (
            fused_step_enabled()
            and not kwargs
            and ancestry is None
            and type(self.self_attn.attention).__name__ == "ScaledDotProductAttention"
            and type(self.enc_attn.attention).__name__ == "ScaledDotProductAttention"
            and not self.self_attn.use_aoa
            and not self.enc_attn.use_aoa
        )

    def _fused_weights(self):
        import jax.numpy as jnp

        def kb(dense):
            p = dense.variables["params"]
            return p["kernel"], p["bias"]

        sa = self.self_attn.attention
        wq, bq = kb(sa.fc_q); wk, bk = kb(sa.fc_k); wv, bv = kb(sa.fc_v)
        wo, bo = kb(sa.fc_o)
        ca = self.enc_attn.attention
        wqc, bqc = kb(ca.fc_q)
        woc, boc = kb(ca.fc_o)
        w1, b1 = kb(self.pwff.fc1); w2, b2 = kb(self.pwff.fc2)

        def ln(mod):
            p = mod.variables["params"]
            return p["scale"], p["bias"]

        ln1s, ln1b = ln(self.self_attn.layer_norm)
        ln2s, ln2b = ln(self.enc_attn.layer_norm)
        ln3s, ln3b = ln(self.pwff.layer_norm)
        return {
            "wqkv": jnp.concatenate([wq, wk, wv], axis=1),
            "bqkv": jnp.concatenate([bq, bk, bv]),
            "wo": wo, "bo": bo, "ln1s": ln1s, "ln1b": ln1b,
            "wqc": wqc, "bqc": bqc, "woc": woc, "boc": boc,
            "ln2s": ln2s, "ln2b": ln2b,
            "w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "ln3s": ln3s, "ln3b": ln3b,
        }

    def _fused_step(self, queries, layer_cache, decode_index,
                    self_attention_mask, enc_attention_mask):
        import jax.numpy as jnp

        from openviic_tpu.ops.fused_decoder_step import fused_layer_step

        sc = layer_cache["self"]
        cc = layer_cache["cross"]
        n, L = sc["k"].shape[0], sc["k"].shape[1]
        h = sc["k"].shape[2]
        M = cc["k"].shape[1]

        def flat(c):
            return c.reshape(c.shape[0], c.shape[1], -1)

        x = queries[:, 0, :]
        self_mask = jnp.broadcast_to(
            self_attention_mask[:, 0, 0, :], (n, L)
        )
        cross_mask = jnp.broadcast_to(enc_attention_mask[:, 0, 0, :], (n, M))
        y, kc, vc = fused_layer_step(
            x,
            flat(sc["k"]), flat(sc["v"]),
            flat(cc["k"]), flat(cc["v"]),
            self_mask, cross_mask, jnp.asarray(decode_index), self._fused_weights(),
            n_heads=h,
        )
        new_cache = dict(layer_cache)
        new_cache["self"] = {
            "k": kc.reshape(sc["k"].shape),
            "v": vc.reshape(sc["v"].shape),
        }
        return y[:, None, :], new_cache


class MeshedDecoderLayer(nn.Module):
    """Self-attn + per-level cross-attn with gated fusion (decoders.py:30-73)."""

    config: Any

    def setup(self):
        cfg = self.config
        self.self_attn = MultiHeadAttention(cfg.SELF_ATTENTION, name="self_attn")
        self.enc_attn = MultiHeadAttention(cfg.ENC_ATTENTION, name="enc_attn")
        self.pwff = make_pwff(cfg.ENC_ATTENTION, name="pwff")
        self.nlayers = cfg.N_ENCODER_LAYERS
        self.fc_alphas = [
            nn.Dense(
                cfg.D_MODEL, kernel_init=xavier_uniform, bias_init=zeros,
                name=f"fc_alpha_{i}",
            )
            for i in range(self.nlayers)
        ]

    def _fuse(self, self_att, enc_atts):
        out_att = 0.0
        for fc_alpha, enc_att in zip(self.fc_alphas, enc_atts):
            alpha = jax.nn.sigmoid(
                fc_alpha(jnp.concatenate([self_att, enc_att], axis=-1))
            )
            out_att = out_att + alpha * enc_att
        return out_att / jnp.sqrt(jnp.asarray(float(self.nlayers)))

    def __call__(self, queries, keys, values, self_padding_mask, self_attention_mask,
                 enc_attention_mask, train: bool = False, **kwargs):
        self_att = self.self_attn(
            queries, queries, queries,
            padding_mask=self_padding_mask, attention_mask=self_attention_mask,
            train=train, **kwargs,
        )
        enc_atts = [
            self.enc_attn(
                self_att, keys[:, ith], values[:, ith],
                padding_mask=self_padding_mask, attention_mask=enc_attention_mask,
                train=train, **kwargs,
            )
            for ith in range(self.nlayers)
        ]
        out_att = self._fuse(self_att, enc_atts)
        ff = self.pwff(out_att, train=train)
        ff = jnp.where(self_padding_mask[:, 0, 0, :, None], 0.0, ff)
        return ff

    def prepare_cache(self, memory: jnp.ndarray) -> DecodeCache:
        # memory: (bs, N, mem, d) — project each level with the shared enc_attn
        levels = [
            self.enc_attn.precompute_cache(memory[:, ith])
            for ith in range(self.nlayers)
        ]
        return {
            "cross": {
                "k": jnp.stack([lv["k"] for lv in levels], axis=1),
                "v": jnp.stack([lv["v"] for lv in levels], axis=1),
            }
        }

    def step(self, queries, layer_cache, decode_index, self_attention_mask,
             enc_attention_mask, ancestry=None, train: bool = False, **kwargs):
        self_att, self_cache = self.self_attn(
            queries, queries, queries,
            attention_mask=self_attention_mask,
            cache=layer_cache["self"], decode_index=decode_index,
            ancestry=ancestry, train=train, **kwargs,
        )
        enc_atts = []
        for ith in range(self.nlayers):
            enc_att, _ = self.enc_attn(
                self_att, None, None,
                attention_mask=enc_attention_mask,
                cache={
                    "k": layer_cache["cross"]["k"][:, ith],
                    "v": layer_cache["cross"]["v"][:, ith],
                },
                static_cache=True, train=train, **kwargs,
            )
            enc_atts.append(enc_att)
        out_att = self._fuse(self_att, enc_atts)
        ff = self.pwff(out_att, train=train)
        new_cache = dict(layer_cache)
        new_cache["self"] = self_cache
        return ff, new_cache


class _DecoderBase(nn.Module):
    """Shared teacher-forced/step plumbing for Decoder & MeshedDecoder."""

    config: Any
    vocab: Any

    layer_cls = DecoderLayer

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.max_len = self.vocab.max_caption_length
        self.padding_idx = self.vocab.padding_idx
        self.N = cfg.LAYERS

        self.word_emb = build_text_embedding(cfg.TEXT_EMBEDDING, self.vocab)
        self.pos_table = jnp.asarray(
            sinusoid_encoding_table(self.max_len + 1, cfg.D_MODEL, padding_idx=0)
        )
        self.layers = [
            type(self).layer_cls(cfg.ATTENTION, name=f"layer_{i}")
            for i in range(cfg.LAYERS)
        ]
        self.fc = nn.Dense(
            len(self.vocab), use_bias=False, kernel_init=torch_linear_kernel, name="fc"
        )

    # -- teacher-forced ------------------------------------------------
    def __call__(self, caption_tokens, encoder_features, encoder_attention_mask,
                 train: bool = False, raw_logits: bool = False):
        b_s, seq_len = caption_tokens.shape[:2]
        pad_mask = generate_padding_mask(caption_tokens, self.padding_idx)
        self_mask = generate_sequential_mask(seq_len)
        self_mask = jnp.logical_or(pad_mask, self_mask)

        seq = jnp.broadcast_to(jnp.arange(1, seq_len + 1)[None, :], (b_s, seq_len))
        seq = jnp.where(pad_mask[:, 0, 0, :], 0, seq)

        embedded, _ = self.word_emb(caption_tokens, train=train)
        out = embedded + jnp.take(self.pos_table, seq, axis=0).astype(embedded.dtype)
        for layer in self.layers:
            out = layer(
                queries=out, keys=encoder_features, values=encoder_features,
                self_padding_mask=pad_mask, self_attention_mask=self_mask,
                enc_attention_mask=encoder_attention_mask, train=train,
            )
        out = self.fc(out)
        if raw_logits:
            # fused-loss training path (training/steps.py::fused_nll): the
            # (bs, L, |V|) f32 log-softmax never hits HBM — the caller
            # computes nll = lse(logits) - logits[target] with reductions
            # fused into the head matmul's consumers
            return out
        return jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)

    # -- step decoding --------------------------------------------------
    def init_cache(self, batch_size: int) -> DecodeCache:
        """Zero-initialised cache (no params needed — callable outside apply)."""
        cfg = self.config
        self_cfg = cfg.ATTENTION.SELF_ATTENTION
        L = self.vocab.max_caption_length
        layers = []
        for _ in range(cfg.LAYERS):
            layers.append(
                {
                    "self": {
                        "k": jnp.zeros(
                            (batch_size, L, self_cfg.HEAD, self_cfg.D_KEY)
                        ),
                        "v": jnp.zeros(
                            (batch_size, L, self_cfg.HEAD, self_cfg.D_VALUE)
                        ),
                    },
                    "cross": None,  # filled by prepare_cache under apply
                }
            )
        return {
            "layers": layers,
            "pad": jnp.zeros((batch_size, L), dtype=bool),
        }

    def prepare_cache(self, cache: DecodeCache, encoder_features) -> DecodeCache:
        """Project cross-attention K/V once (requires params -> under apply)."""
        new_layers = []
        for layer, layer_cache in zip(self.layers, cache["layers"]):
            lc = dict(layer_cache)
            lc.update(layer.prepare_cache(encoder_features))
            new_layers.append(lc)
        return {**cache, "layers": new_layers}

    def _step_masks(self, tokens_t, t, cache, ancestry=None):
        """Update the running pad mask; build self/cross attention masks.

        With ``ancestry`` the pad buffer (like the KV caches) is never
        physically reordered; each beam's mask is resolved through the
        ancestry table."""
        is_pad = (tokens_t == self.padding_idx)[:, :1]  # (bs, 1)
        pad = jax.lax.dynamic_update_slice_in_dim(cache["pad"], is_pad, t, axis=1)
        L = pad.shape[1]
        future = jnp.arange(L)[None, :] > t  # mask positions beyond t
        pad_read = pad
        if ancestry is not None:
            b_s, n_beams, _ = ancestry.shape
            pad_read = jnp.take_along_axis(
                pad.reshape(b_s, n_beams, L), ancestry, axis=1
            ).reshape(pad.shape)
        self_mask = (pad_read | future)[:, None, None, :]  # (bs, 1, 1, L)
        return pad, self_mask

    def step(self, t, tokens_t, cache: DecodeCache, encoder_attention_mask,
             ancestry=None, raw_head: bool = False, resident_kernel: bool = False,
             train: bool = False, **kwargs):
        """One decode step.  ``tokens_t``: (bs, 1) current input token.

        Returns (log_probs (bs, vocab), new_cache); with ``raw_head`` the
        first element is ``(logits (bs, vocab) f32, logsumexp (bs,))`` so
        the beam-search fast path can fold the log-softmax into selection
        instead of materialising the full distribution.  ``train=True``
        activates dropout per step (SCST sampling under model.train(),
        vi_trainer.py:126-132) — callers must supply a "dropout" rng."""
        # In pure-XLA beam-resident mode the pad mask stays *raw* (each
        # slot's own rows) and is applied on the slot axis inside the
        # attention (attention.py mask_axis='p') — the per-q ancestry
        # resolve is a slow per-element gather on TPU
        raw_mask = (
            kwargs.get("beam_select") is not None and ancestry is not None
        )
        pad, self_mask = self._step_masks(
            tokens_t, t, cache, ancestry=None if raw_mask else ancestry
        )
        # Each reference layer zeroes its output where the *input* token is
        # pad (decoders.py:26 ``ff.masked_fill(self_padding_mask...)``) —
        # this fires for live beams that emit <pad> as a word, so skipping
        # it changes beam scores (caught by tests/test_reference_parity.py).
        is_pad = (tokens_t == self.padding_idx)[:, :1, None]  # (bs, 1, 1)

        embedded, _ = self.word_emb(tokens_t, train=train)
        # position index is t+1 regardless of pad (decoders.py:107-109)
        out = embedded + self.pos_table[t + 1][None, None, :].astype(embedded.dtype)

        layer_kwargs = dict(kwargs, train=train)
        if raw_mask:
            layer_kwargs["mask_axis"] = "p"
        if resident_kernel:
            # the fused layer kernel applies the pad-zeroing itself
            layer_kwargs.update(resident_kernel=True, is_pad_t=is_pad[:, :, 0])

        new_layers = []
        for layer, layer_cache in zip(self.layers, cache["layers"]):
            out, lc = layer.step(
                out, layer_cache, t,
                self_attention_mask=self_mask,
                enc_attention_mask=encoder_attention_mask,
                ancestry=ancestry,
                **layer_kwargs,
            )
            out = jnp.where(is_pad, 0.0, out)
            new_layers.append(lc)

        new_cache = {"layers": new_layers, "pad": pad}
        if raw_head == "hidden":
            # pre-head hidden state — the caller fuses the vocab projection
            # + lse + top-k in one kernel (ops/head_topk.py)
            return out[:, 0, :], new_cache
        logits = self.fc(out).astype(jnp.float32)[:, 0, :]
        if raw_head:
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            return (logits, lse), new_cache
        return jax.nn.log_softmax(logits, axis=-1), new_cache


@META_DECODER.register()
class Decoder(_DecoderBase):
    """Generic N-layer masked decoder (decoders.py:75-123)."""

    layer_cls = DecoderLayer


@META_DECODER.register()
class MeshedDecoder(_DecoderBase):
    """Meshed-memory decoder over stacked encoder levels (decoders.py:125-173)."""

    layer_cls = MeshedDecoderLayer


@META_DECODER.register()
class AdaptiveDecoder(_DecoderBase):
    """RSTNet adaptive decoder (decoders.py:175-230), built *fixed*.

    N standard layers + 1 adaptive layer whose attention kernels receive
    per-position language signals from a frozen pretrained LM.  During step
    decoding the LM sees only the current token — exactly the reference's
    stateful behavior (decoders.py:216 receives the 1-token step input).
    """

    layer_cls = DecoderLayer

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.max_len = self.vocab.max_caption_length
        self.padding_idx = self.vocab.padding_idx
        self.N = cfg.LAYERS

        self.word_emb = build_text_embedding(cfg.TEXT_EMBEDDING, self.vocab)
        self.pos_table = jnp.asarray(
            sinusoid_encoding_table(self.max_len + 1, cfg.D_MODEL, padding_idx=0)
        )
        self.layers = [
            DecoderLayer(
                cfg.ATTENTION if i < cfg.LAYERS else cfg.ADAPTIVE_ATTENTION,
                name=f"layer_{i}",
            )
            for i in range(cfg.LAYERS + 1)
        ]
        self.fc = nn.Dense(
            len(self.vocab), use_bias=False, kernel_init=torch_linear_kernel, name="fc"
        )
        self.language_model = build_pretrained_language_model(cfg.LANGUAGE_MODEL)

    def init_cache(self, batch_size: int) -> DecodeCache:
        cfg = self.config
        L = self.vocab.max_caption_length
        layers = []
        for i in range(cfg.LAYERS + 1):
            self_cfg = (
                cfg.ATTENTION if i < cfg.LAYERS else cfg.ADAPTIVE_ATTENTION
            ).SELF_ATTENTION
            layers.append(
                {
                    "self": {
                        "k": jnp.zeros((batch_size, L, self_cfg.HEAD, self_cfg.D_KEY)),
                        "v": jnp.zeros((batch_size, L, self_cfg.HEAD, self_cfg.D_VALUE)),
                    },
                    "cross": None,
                }
            )
        return {"layers": layers, "pad": jnp.zeros((batch_size, L), dtype=bool)}

    def __call__(self, caption_tokens, encoder_features, encoder_attention_mask,
                 train: bool = False, raw_logits: bool = False):
        b_s, seq_len = caption_tokens.shape[:2]
        pad_mask = generate_padding_mask(caption_tokens, self.padding_idx)
        self_mask = generate_sequential_mask(seq_len)
        self_mask = jnp.logical_or(pad_mask, self_mask)

        seq = jnp.broadcast_to(jnp.arange(1, seq_len + 1)[None, :], (b_s, seq_len))
        seq = jnp.where(pad_mask[:, 0, 0, :], 0, seq)

        if self.config.LANGUAGE_MODEL.get("SIGNAL_MODE", "prefix") == "token":
            # per-token signals — the SAME function the step decoder
            # evaluates (1-token LM forward per position), so training and
            # decode are consistent.  The reference's training forward
            # feeds the LM the full sequence while its step path feeds one
            # token (decoders.py:216 vs base_transformer.py:30-43) — and
            # its bidirectional backbone leaks FUTURE tokens into position
            # t's signal during training, so a model trained in "prefix"
            # mode decodes garbage (round-5 finding: val_loss 1.34 with
            # dev CIDEr 0.0001).  "token" mode removes both the mismatch
            # and the leak; "prefix" (default) keeps reference parity.
            flat = caption_tokens.reshape(-1, 1)
            # pad rows would be FULLY masked inside the LM (pad key +
            # causal self only) — forward is guarded, but the softmax
            # VJP computes nan*0 through the zeroed branch (the classic
            # double-where pitfall), poisoning the first gradient update
            # (loss 8.70 -> nan at step 1, round-5 measurement).  Their
            # signals are never observable (pad query outputs are zeroed
            # per layer and the loss ignores pad targets), so substitute
            # a safe token id before the LM call.
            flat = jnp.where(
                flat == self.padding_idx, self.vocab.bos_idx, flat
            )
            _, sig = self.language_model(flat)
            language_signals = sig.reshape(b_s, seq_len, -1)
        else:
            _, language_signals = self.language_model(caption_tokens)

        embedded, _ = self.word_emb(caption_tokens, train=train)
        out = embedded + jnp.take(self.pos_table, seq, axis=0).astype(embedded.dtype)
        for layer in self.layers:
            out = layer(
                queries=out, keys=encoder_features, values=encoder_features,
                self_padding_mask=pad_mask, self_attention_mask=self_mask,
                enc_attention_mask=encoder_attention_mask,
                language_signals=language_signals, train=train,
            )
        out = self.fc(out)
        if raw_logits:
            return out
        return jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)

    def language_signal_table(self) -> jnp.ndarray:
        """(vocab, d) language signals for every caption-vocab token.

        Exactness: during step decoding the LM receives ONLY the current
        token (reference decoders.py:216), so its output is a pure
        function of the token id — the whole per-step LM forward can be
        replaced by one row of this table.  Compute once per checkpoint
        (BaseTransformer.compute_language_table) and pass to
        ``beam_search(..., language_table=...)``; measured 1.9x decode
        throughput on the RSTNet demo checkpoint (PERF.md round 4 —
        the per-step LM was ~5.6 of ~16.5 ms/step at 320 rows)."""
        ids = jnp.arange(len(self.vocab), dtype=jnp.int32)[:, None]
        _, signals = self.language_model(ids)
        return signals[:, 0]

    def step(self, t, tokens_t, cache: DecodeCache, encoder_attention_mask,
             ancestry=None, raw_head: bool = False, train: bool = False,
             **kwargs):
        pad, self_mask = self._step_masks(tokens_t, t, cache, ancestry=ancestry)
        is_pad = (tokens_t == self.padding_idx)[:, :1, None]  # (bs, 1, 1)

        table = cache.get("language_table")
        if table is not None:
            # precomputed per-token signals: one gather replaces the
            # 4-layer frozen-LM forward (see language_signal_table)
            language_signals = jnp.take(table, tokens_t[:, 0], axis=0)[:, None]
        else:
            _, language_signals = self.language_model(tokens_t)

        embedded, _ = self.word_emb(tokens_t, train=train)
        out = embedded + self.pos_table[t + 1][None, None, :].astype(embedded.dtype)

        new_layers = []
        for layer, layer_cache in zip(self.layers, cache["layers"]):
            out, lc = layer.step(
                out, layer_cache, t,
                self_attention_mask=self_mask,
                enc_attention_mask=encoder_attention_mask,
                ancestry=ancestry,
                language_signals=language_signals,
                train=train,
            )
            out = jnp.where(is_pad, 0.0, out)
            new_layers.append(lc)

        logits = self.fc(out).astype(jnp.float32)[:, 0, :]
        new_cache = {"layers": new_layers, "pad": pad}
        if raw_head:
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            return (logits, lse), new_cache
        return jax.nn.log_softmax(logits, axis=-1), new_cache
