"""HF weight graft for RSTNet (scripts/graft_hf.py).

Builds a tiny FlaxRoberta locally (save_pretrained — no network), points
MODEL.DECODER.LANGUAGE_MODEL.PRETRAINED_NAME at it so the real HF
architecture is constructed (models/language_models.py _HFBackboneAdapter),
then grafts the pretrained weights under the ``backbone/hf`` scope and
decodes end-to-end with real language signals — the demonstrated graft the
reference achieves with ``from_pretrained`` (models/language_models.py:17-21).
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from openviic_tpu.builders import build_model
from openviic_tpu.config import ConfigNode
from openviic_tpu.decoding import beam_search
from tests.helpers import D_MODEL, attention_config, model_config
from tests.test_models_forward import make_batch

import sys

sys.path.insert(0, "scripts")
from graft_hf import graft_hf_params  # noqa: E402


@pytest.fixture(scope="module")
def tiny_roberta(tmp_path_factory):
    """A tiny FlaxRobertaModel saved locally via save_pretrained."""
    from transformers import FlaxRobertaModel, RobertaConfig

    cfg = RobertaConfig(
        vocab_size=64,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=40,
        pad_token_id=0,
    )
    model = FlaxRobertaModel(cfg, seed=0)
    path = tmp_path_factory.mktemp("tiny_roberta")
    model.save_pretrained(str(path))
    return str(path), model


def _rstnet_config(tiny_vocab, pretrained_name):
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
            "PRETRAINED_NAME": pretrained_name,
            "HIDDEN_SIZE": 16,
            "D_MODEL": D_MODEL,
            "MAX_LEN": tiny_vocab.max_caption_length,
            "VOCAB_SIZE": len(tiny_vocab),
            "PADDING_IDX": tiny_vocab.padding_idx,
            "ATTENTION": attention_config(),
        }
    )
    return cfg


def test_graft_replaces_backbone_and_decodes(tiny_vocab, tiny_roberta):
    path, hf_model = tiny_roberta
    cfg = _rstnet_config(tiny_vocab, path)
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)

    # the HF architecture was constructed (hf scope exists)
    lm = params["params"]["decoder"]["language_model"]
    assert "hf" in lm["backbone"], list(lm["backbone"].keys())

    grafted = graft_hf_params(params, path)

    # grafted leaves equal the pretrained weights exactly
    got = grafted["params"]["decoder"]["language_model"]["backbone"]["hf"]
    want_leaves = jax.tree.leaves(hf_model.params)
    got_leaves = jax.tree.leaves(got)
    assert len(want_leaves) == len(got_leaves)
    for a, b in zip(want_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # real language signals flow end to end: teacher-forced output changes
    # vs the random-init backbone, and beam decode runs finite
    before = model.apply(params, batch)
    after = model.apply(grafted, batch)
    assert not np.allclose(np.asarray(before), np.asarray(after))
    outs, lps = beam_search(model, grafted, batch, beam_size=2, out_size=1)
    assert np.isfinite(np.asarray(lps)).all()
    assert outs.shape == (2, tiny_vocab.max_caption_length)


def test_graft_rejects_mismatched_architecture(tiny_vocab, tiny_roberta, tmp_path):
    from transformers import FlaxRobertaModel, RobertaConfig

    path, _ = tiny_roberta
    cfg = _rstnet_config(tiny_vocab, path)
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)

    other = FlaxRobertaModel(
        RobertaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=40, pad_token_id=0,
        ),
        seed=0,
    )
    other_dir = tmp_path / "other"
    other.save_pretrained(str(other_dir))
    with pytest.raises(ValueError, match="does not match"):
        graft_hf_params(params, str(other_dir))


def test_graft_requires_hf_backbone(tiny_vocab):
    """Without PRETRAINED_NAME the mini-backbone is built — no graft point."""
    cfg = _rstnet_config(tiny_vocab, None)
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="no backbone/hf"):
        graft_hf_params(params, "irrelevant")
