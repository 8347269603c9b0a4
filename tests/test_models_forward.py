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
