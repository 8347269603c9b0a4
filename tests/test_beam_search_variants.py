"""Beam-search consistency for the non-standard decoders/architectures.

For each variant: the cached step-decode must agree with the teacher-forced
forward on the same prefix (validates meshed per-level cross caches, DLCT
merged masks, adaptive language-signal steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.config import ConfigNode
from openviic_tpu.decoding import beam_search
from openviic_tpu.models.base import make_decode_cache
from tests.helpers import attention_config, model_config, D_MODEL
from tests.test_models_forward import make_batch


def _check_step_vs_teacher_forced(model, params, batch, vocab, atol=1e-4):
    bs = 2
    L = vocab.max_caption_length
    rng = np.random.default_rng(3)
    tokens = np.full((bs, L), vocab.padding_idx, np.int32)
    tokens[:, 0] = vocab.bos_idx
    n_real = 4
    tokens[:, 1 : 1 + n_real] = rng.integers(4, len(vocab), size=(bs, n_real))

    memory, memory_mask = model.apply(params, batch, method=model.encoder_forward)
    tf_out = model.apply(params, dict(batch, caption_tokens=jnp.asarray(tokens)))

    cache = make_decode_cache(model.config.DECODER, vocab, bs)
    cache = model.apply(params, cache, memory, method=model.prepare_cache)
    for t in range(n_real + 1):
        tok_t = jnp.asarray(tokens[:, t : t + 1])
        step_lp, cache = model.apply(
            params, t, tok_t, cache, memory_mask, method=model.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(step_lp), np.asarray(tf_out[:, t, :]), atol=atol,
            err_msg=f"step {t}",
        )


def test_meshed_decoder_step_consistency(tiny_vocab):
    cfg = model_config(
        architecture="MeshedMemoryTransformer",
        encoder="MultilevelEncoder",
        decoder="MeshedDecoder",
        enc_attention="AugmentedMemoryScaledDotProductAttention",
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    _check_step_vs_teacher_forced(model, params, batch, tiny_vocab)
    outs, lps = beam_search(model, params, batch, beam_size=3, out_size=3)
    assert outs.shape == (2, 3, tiny_vocab.max_caption_length)
    assert np.isfinite(np.asarray(lps)).all()


def test_dlct_transformer_beam_search(tiny_vocab):
    cfg = model_config(architecture="DLCTTransformer")
    cfg.MODEL if False else None
    cfg = ConfigNode(cfg.to_dict())
    cfg._data["VISION_EMBEDDING"] = ConfigNode(
        {
            "ARCHITECTURE": "GeometricDualFeatureEmbedding",
            "D_REGION_FEATURE": 13,
            "D_GRID_FEATURE": 11,
            "D_MODEL": D_MODEL,
            "DROPOUT": 0.1,
        }
    )
    cfg._data["ENCODER"] = ConfigNode(
        {
            "ARCHITECTURE": "DualCollaborativeLevelEncoder",
            "D_MODEL": D_MODEL,
            "LAYERS": 2,
            "HEAD": 2,
            "TRIGNOMETRIC_EMBEDDING": True,
            "SELF_ATTENTION": attention_config(
                "AugmentedGeometryScaledDotProductAttention"
            ),
            "CROSS_ATTENTION": attention_config(
                "AugmentedGeometryScaledDotProductAttention"
            ),
        }
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    _check_step_vs_teacher_forced(model, params, batch, tiny_vocab)
    outs, _ = beam_search(model, params, batch, beam_size=2, out_size=1)
    caps = tiny_vocab.decode_caption(np.asarray(outs))
    assert len(caps) == 2


def test_adaptive_decoder_beam_search(tiny_vocab):
    cfg = model_config(decoder="AdaptiveDecoder")
    dec = cfg.DECODER
    dec._data["ADAPTIVE_ATTENTION"] = ConfigNode(
        {
            "SELF_ATTENTION": attention_config(
                "AdaptiveScaledDotProductAttention", can_be_stateful=True
            ),
            "ENC_ATTENTION": attention_config("AdaptiveScaledDotProductAttention"),
        }
    )
    dec._data["LANGUAGE_MODEL"] = ConfigNode(
        {
            "ARCHITECTURE": "PhoBERTModel",
            "HIDDEN_SIZE": 16,
            "D_MODEL": D_MODEL,
            "MAX_LEN": tiny_vocab.max_caption_length,
            "VOCAB_SIZE": len(tiny_vocab),
            "PADDING_IDX": tiny_vocab.padding_idx,
            "BACKBONE_LAYERS": 1,
            "BACKBONE_HEADS": 2,
            "ATTENTION": attention_config(),
        }
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)

    # NOTE: adaptive decode steps feed the LM only the current token (the
    # reference's stateful behavior, decoders.py:216), while teacher-forced
    # runs it over the full sequence — so step-vs-forward parity does not
    # hold for this decoder by design.  Check decode runs and is finite.
    outs, lps = beam_search(model, params, batch, beam_size=2, out_size=1)
    assert outs.shape == (2, tiny_vocab.max_caption_length)
    assert np.isfinite(np.asarray(lps)).all()
