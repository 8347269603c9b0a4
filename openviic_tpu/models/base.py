"""BaseTransformer: the architecture shell.

Reference equivalent: models/base_transformer.py:8-53.  The reference's
``step``/``beam_search`` live on the stateful model; here the model exposes
pure methods (``encoder_forward``, ``prepare_cache``, ``decode_step``) and
the beam-search driver (openviic_tpu/decoding/beam_search.py) threads the
explicit DecodeCache pytree through a jitted scan.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from openviic_tpu.models.decoders import DecodeCache


def make_decode_cache(decoder_config, vocab, batch_size: int) -> DecodeCache:
    """Build a zero DecodeCache from config shapes (no params required).

    Layout must match the decoder's ``init_cache``; dispatching on the
    registered architecture name keeps this callable outside ``apply``."""
    arch = decoder_config.ARCHITECTURE
    L = vocab.max_caption_length
    n_layers = decoder_config.LAYERS + (1 if arch == "AdaptiveDecoder" else 0)
    layers = []
    for i in range(n_layers):
        if arch == "AdaptiveDecoder" and i == decoder_config.LAYERS:
            self_cfg = decoder_config.ADAPTIVE_ATTENTION.SELF_ATTENTION
        else:
            self_cfg = decoder_config.ATTENTION.SELF_ATTENTION
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


class BaseTransformer(nn.Module):
    """Composition shell: vision embedding -> encoder -> decoder."""

    config: Any
    vocab: Any

    # -- subclass hooks --------------------------------------------------
    def encoder_forward(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        raise NotImplementedError

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False,
                 raw_logits: bool = False):
        """Teacher-forced forward -> (bs, seq_len, vocab) log-probs.

        ``raw_logits=True`` skips the f32 log-softmax and returns the head
        logits in compute dtype (fused-NLL training path)."""
        encoder_features, encoder_padding_mask = self.encoder_forward(
            batch, train=train
        )
        return self.decoder(
            caption_tokens=batch["caption_tokens"],
            encoder_features=encoder_features,
            encoder_attention_mask=encoder_padding_mask,
            train=train,
            raw_logits=raw_logits,
        )

    # -- decode API (called under apply) ---------------------------------
    def prepare_cache(self, cache: DecodeCache, encoder_features) -> DecodeCache:
        return self.decoder.prepare_cache(cache, encoder_features)

    def compute_language_table(self):
        """(vocab, d) precomputed language-signal table, or None for
        decoders without a frozen-LM stream.  Serving computes this once
        per checkpoint and passes it to ``beam_search(language_table=…)``
        — see AdaptiveDecoder.language_signal_table for the exactness
        argument."""
        fn = getattr(self.decoder, "language_signal_table", None)
        return None if fn is None else fn()

    def decode_step(self, t, tokens_t, cache: DecodeCache, encoder_attention_mask,
                    ancestry=None, beam_select=None, raw_head: bool = False,
                    resident_kernel: bool = False, attn_kernel: bool = False,
                    train: bool = False):
        kwargs = {}
        if beam_select is not None:
            # beam-resident decode (decoding/beam_search.py beam_resident):
            # the static beam size flows to the attention layers so they can
            # group rows by image
            kwargs["beam_select"] = beam_select
            if resident_kernel:
                kwargs["resident_kernel"] = True
            if attn_kernel:
                # fused beam-select self-attention step kernel
                # (ops/beam_select_attention.py)
                kwargs["attn_kernel"] = True
        return self.decoder.step(
            t, tokens_t, cache, encoder_attention_mask, ancestry=ancestry,
            raw_head=raw_head, train=train, **kwargs
        )
