"""Forward-pass smoke + consistency tests for every architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from tests.helpers import model_config


def make_batch(vocab, bs=2, n_regions=5, n_grids=9, d_feature=13, d_grid=11, seed=0):
    rng = np.random.default_rng(seed)
    caption = np.full((bs, vocab.max_caption_length), vocab.padding_idx, np.int32)
    caption[:, 0] = vocab.bos_idx
    caption[:, 1:4] = rng.integers(4, len(vocab), size=(bs, 3))
    boxes = rng.uniform(0, 0.5, size=(bs, n_regions, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 0.3
    batch = {
        "caption_tokens": jnp.asarray(caption),
        "region_features": jnp.asarray(
            rng.normal(size=(bs, n_regions, d_feature)).astype(np.float32)
        ),
        "region_boxes": jnp.asarray(boxes),
        "grid_features": jnp.asarray(
            rng.normal(size=(bs, n_grids, d_grid)).astype(np.float32)
        ),
        "grid_boxes": jnp.asarray(
            np.tile(np.array([[0.1, 0.1, 0.4, 0.4]], np.float32), (bs, n_grids, 1))
        ),
    }
    return batch


CASES = [
    ("StandardTransformerUsingRegion", "Encoder", "Decoder", "ScaledDotProductAttention", False),
    ("StandardTransformerUsingGrid", "Encoder", "Decoder", "ScaledDotProductAttention", False),
    ("StandardTransformerUsingRegion", "Encoder", "Decoder", "ScaledDotProductAttention", True),  # AoA
    ("MeshedMemoryTransformer", "MultilevelEncoder", "MeshedDecoder", "AugmentedMemoryScaledDotProductAttention", False),
    ("ObjectRelationTransformer", "GeometricEncoder", "Decoder", "AugmentedGeometryScaledDotProductAttention", False),
    ("CamoTransformer", "CrossAttentionMultiLevelEncoder", "Decoder", "ScaledDotProductAttention", False),
]


@pytest.mark.parametrize("arch,encoder,decoder,attn,aoa", CASES)
def test_forward_shapes(tiny_vocab, arch, encoder, decoder, attn, aoa):
    layers = 3 if encoder == "CrossAttentionMultiLevelEncoder" else 2
    d_feature = 11 if arch == "StandardTransformerUsingGrid" else 13
    cfg = model_config(
        architecture=arch,
        encoder=encoder,
        decoder=decoder,
        enc_attention=attn,
        use_aoa=aoa,
        d_feature=d_feature,
        layers=layers,
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out.shape == (2, tiny_vocab.max_caption_length, len(tiny_vocab))
    # log-probs: each row sums to 1 in prob space
    probs = jnp.exp(out)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)
    assert not np.isnan(np.asarray(out)).any()


def test_padded_rows_zeroed(tiny_vocab):
    """Encoder output rows for padded (all-zero) feature rows must be 0."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    # zero out the last two region rows -> padding
    rf = np.array(batch["region_features"])
    rf[:, -2:, :] = 0.0
    batch["region_features"] = jnp.asarray(rf)
    params = model.init(jax.random.PRNGKey(0), batch)
    memory, mask = model.apply(params, batch, method=model.encoder_forward)
    assert bool(mask[0, 0, 0, -1]) and bool(mask[0, 0, 0, -2])
    np.testing.assert_allclose(np.asarray(memory[:, -2:, :]), 0.0, atol=1e-6)


def test_dropout_changes_output_in_train_mode(tiny_vocab):
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    out_eval = model.apply(params, batch)
    out_train = model.apply(
        params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))


def test_unified_transformer_forward(tiny_vocab):
    """UnifiedTransformer concatenates region feats+boxes+grid feats+boxes
    on the sequence axis (unified_transformer.py:21-55) — all streams must
    share D_FEATURE for that to typecheck; use 4-d features to match boxes."""
    cfg = model_config(architecture="UnifiedTransformer", d_feature=4)
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, d_feature=4, d_grid=4)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out.shape == (2, tiny_vocab.max_caption_length, len(tiny_vocab))


def test_lstm_text_embedding(tiny_vocab):
    from openviic_tpu.builders import build_text_embedding
    from openviic_tpu.config import ConfigNode

    cfg = ConfigNode(
        {
            "ARCHITECTURE": "LSTMTextEmbedding",
            "D_MODEL": 16,
            "D_EMBEDDING": 10,
            "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
            "DROPOUT": 0.1,
        }
    )
    emb = build_text_embedding(cfg, tiny_vocab)
    tokens = jnp.asarray(np.array([[1, 5, 6, 0], [1, 7, 0, 0]], np.int32))
    params = emb.init(jax.random.PRNGKey(0), tokens)
    feats, (pad_mask, seq_mask) = emb.apply(params, tokens)
    assert feats.shape == (2, 4, 16)
    assert pad_mask.shape == (2, 1, 1, 4) and bool(pad_mask[0, 0, 0, 3])
    assert seq_mask.shape == (1, 1, 4, 4)
