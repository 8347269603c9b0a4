"""Frozen pretrained language models for RSTNet-style adaptive decoding.

Reference equivalent: models/language_models.py:11-133 (``BERTModel`` /
``PhoBERTModel``): a frozen HF BERT/RoBERTa backbone + projection + one
encoder layer + vocab head, returning ``(log_probs, language_feature)``.
The reference never registers these into its (broken) registry
(SURVEY.md #30); here they are registered and buildable.

Offline-first: if the HF checkpoint cannot be loaded (no network), the
backbone falls back to a randomly-initialised Flax mini-transformer with
the same interface — the adaptive decoder stays trainable end-to-end and
real weights can be grafted in later via ``load_hf_weights``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from openviic_tpu.builders import META_PRETRAINED_LANGUAGE_MODEL
from openviic_tpu.models.initializers import (
    torch_embedding_init,
    torch_linear_bias,
    torch_linear_kernel,
)
from openviic_tpu.models.masks import generate_padding_mask, generate_sequential_mask
from openviic_tpu.models.positional import sinusoid_encoding_table


class _MiniBertBackbone(nn.Module):
    """Random-init stand-in for a frozen HF encoder (same call surface)."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    max_positions: int = 512

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        x = nn.Embed(
            self.vocab_size, self.hidden_size, embedding_init=torch_embedding_init,
            name="tok_emb",
        )(input_ids)
        pos = jnp.arange(input_ids.shape[1])
        x = x + nn.Embed(
            self.max_positions, self.hidden_size, embedding_init=torch_embedding_init,
            name="pos_emb",
        )(pos)[None]
        x = nn.LayerNorm(epsilon=1e-12, name="emb_ln")(x)
        # flax convention: mask True = attend
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :] > 0
        for i in range(self.num_layers):
            attn_out = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn_{i}"
            )(x, x, mask=mask)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln1_{i}")(x + attn_out)
            h = nn.Dense(self.hidden_size * 4, name=f"ff1_{i}")(x)
            h = nn.Dense(self.hidden_size, name=f"ff2_{i}")(jax.nn.gelu(h))
            x = nn.LayerNorm(epsilon=1e-12, name=f"ln2_{i}")(x + h)
        return x


class _HFBackboneAdapter(nn.Module):
    """Wraps a transformers Flax *module* (a linen Module) so its params
    live inside this model's tree and can be grafted from an HF checkpoint
    later (``scripts`` can copy ``from_pretrained().params`` under the
    ``backbone/hf`` scope)."""

    hf_module_class: Any
    hf_config: Any
    padding_idx: int = 1  # RoBERTa convention

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask = attention_mask.astype(jnp.int32)
        # RoBERTa-style position ids: pad offset + running count of real tokens
        position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        token_type_ids = jnp.zeros_like(input_ids)
        hf = self.hf_module_class(config=self.hf_config, name="hf")
        out = hf(
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
            position_ids=position_ids,
            deterministic=True,
        )
        return out.last_hidden_state


def _load_hf_backbone(hf_model_class, pretrained_name, vocab_size, hidden):
    """Build the HF architecture (config from the hub when reachable,
    offline default otherwise); returns an adapter module or None."""
    try:
        from transformers import AutoConfig

        try:
            # local cache only — avoids minutes of network retries offline;
            # populate the HF cache to pick up the real config/weights
            hf_config = AutoConfig.from_pretrained(
                pretrained_name, local_files_only=True
            )
        except Exception:
            # offline: same architecture family, randomly initialised
            hf_config = hf_model_class.config_class(
                vocab_size=vocab_size, hidden_size=hidden,
                num_hidden_layers=4, num_attention_heads=8,
                intermediate_size=hidden * 4,
            )
        return _HFBackboneAdapter(
            hf_module_class=hf_model_class.module_class,
            hf_config=hf_config,
            padding_idx=getattr(hf_config, "pad_token_id", 1) or 1,
            name="backbone",
        )
    except Exception:
        return None


class _LanguageModelBase(nn.Module):
    """Projection + pos emb + one encoder layer + vocab head over a backbone."""

    config: Any
    vocab: Optional[Any] = None

    def setup(self):
        cfg = self.config
        self.padding_idx = cfg.get("PADDING_IDX", 0)
        d_model = cfg.D_MODEL
        self.d_model = d_model
        hidden = cfg.get("HIDDEN_SIZE", 768)
        vocab_size = cfg.VOCAB_SIZE

        self.backbone = self._make_backbone(vocab_size, hidden)
        self.proj_to_caption_model = nn.Dense(
            d_model,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(hidden),
            name="proj_to_caption_model",
        )
        max_len = cfg.get("MAX_LEN", 54)
        self.pos_table = jnp.asarray(
            sinusoid_encoding_table(max_len + 1, d_model, padding_idx=0)
        )
        from openviic_tpu.models.encoders import EncoderLayer

        self.encoder_layer = EncoderLayer(cfg.ATTENTION, name="encoder_layer")
        self.proj_to_vocab = nn.Dense(
            vocab_size,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(d_model),
            name="proj_to_vocab",
        )

    hf_model_class = None  # subclass hook: lazy transformers Flax class getter

    def _make_backbone(self, vocab_size: int, hidden: int):
        cfg = self.config
        pretrained = cfg.get("PRETRAINED_NAME")
        if pretrained and type(self).hf_model_class is not None:
            try:
                hf_cls = type(self).hf_model_class()
            except Exception:
                hf_cls = None
            if hf_cls is not None:
                hf = _load_hf_backbone(hf_cls, pretrained, vocab_size, hidden)
                if hf is not None:
                    return hf
        return _MiniBertBackbone(
            vocab_size=vocab_size,
            hidden_size=hidden,
            num_layers=cfg.get("BACKBONE_LAYERS", 2),
            num_heads=cfg.get("BACKBONE_HEADS", 8),
            name="backbone",
        )

    def __call__(self, input_ids, attention_mask=None):
        b_s, seq_len = input_ids.shape[:2]
        mask_queries = generate_padding_mask(input_ids, self.padding_idx)
        mask_self = jnp.logical_or(generate_sequential_mask(seq_len), mask_queries)

        seq = jnp.broadcast_to(jnp.arange(1, seq_len + 1)[None, :], (b_s, seq_len))
        seq = jnp.where(mask_queries[:, 0, 0, :], 0, seq)

        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        hidden = self.backbone(input_ids, attention_mask=attention_mask)
        # the backbone is frozen (reference language_models.py:19-21)
        hidden = jax.lax.stop_gradient(hidden)

        language_feature = self.proj_to_caption_model(hidden)
        language_feature = language_feature + jnp.take(self.pos_table, seq, axis=0)
        language_feature = self.encoder_layer(
            queries=language_feature, keys=language_feature, values=language_feature,
            padding_mask=mask_queries, attention_mask=mask_self,
        )
        logits = self.proj_to_vocab(language_feature)
        return jax.nn.log_softmax(logits, axis=-1), language_feature


def _lazy_hf(name):
    """Lazy transformers-class resolver (imports only when actually used)."""

    def get():
        import transformers

        return getattr(transformers, name)

    return get


@META_PRETRAINED_LANGUAGE_MODEL.register()
class BERTModel(_LanguageModelBase):
    hf_model_class = staticmethod(_lazy_hf("FlaxBertModel"))


@META_PRETRAINED_LANGUAGE_MODEL.register()
class PhoBERTModel(_LanguageModelBase):
    hf_model_class = staticmethod(_lazy_hf("FlaxRobertaModel"))
