"""Every shipped config must parse and build (SURVEY.md §2.4: the YAML
``ARCHITECTURE:`` strings are the public API)."""

import glob
import os

import jax
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.config import get_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))
    if "tiny_test" not in p
)

REFERENCE_NAMES = [
    "standard_transformer.yaml",
    "standard_transformer_using_region.yaml",
    "attention_on_attention.yaml",
    "augmented_memory_transformer.yaml",
    "meshed_memory_transformer.yaml",
    "object_relation_transformer.yaml",
    "camo_transformer.yaml",
    "rstnet.yaml",
    "dlct-transformer.yaml",
]


def test_all_nine_reference_configs_exist():
    for name in REFERENCE_NAMES:
        assert name in ALL_CONFIGS, f"missing reference config {name}"


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_parses_and_model_builds(name, tiny_vocab):
    cfg = get_config(os.path.join(CONFIG_DIR, name))
    # required sections
    for section in ("TRAINER", "DATASET", "TRAINING", "MODEL"):
        assert section in cfg
    assert cfg.TRAINING.SCORE  # defaulted for the broken configs
    assert cfg.DATASET.FEATURE_BATCH_SIZE  # mapped from BATCH_SIZE if needed

    # shrink the rstnet language model so init is cheap
    if "LANGUAGE_MODEL" in cfg.MODEL.DECODER:
        cfg.merge_from_list(
            [
                "MODEL.DECODER.LANGUAGE_MODEL.VOCAB_SIZE", "128",
                "MODEL.DECODER.LANGUAGE_MODEL.HIDDEN_SIZE", "32",
                "MODEL.DECODER.LANGUAGE_MODEL.BACKBONE_LAYERS", "1",
            ]
        )

    model = build_model(cfg.MODEL, tiny_vocab)
    assert model is not None

    # trainer name resolves (aliases cover the broken 'ViTrainer')
    import openviic_tpu.training  # noqa: F401  (registers trainers)
    from openviic_tpu.builders import META_TRAINER

    assert cfg.TRAINER in META_TRAINER


@pytest.mark.parametrize(
    "name", ["meshed_memory_transformer.yaml", "object_relation_transformer.yaml"]
)
def test_full_scale_init_and_forward(name, tiny_vocab):
    """Init + forward at reference scale for two representative configs."""
    cfg = get_config(os.path.join(CONFIG_DIR, name))
    model = build_model(cfg.MODEL, tiny_vocab)
    rng = np.random.default_rng(0)
    bs, n = 2, 10
    caption = np.full((bs, tiny_vocab.max_caption_length), 0, np.int32)
    caption[:, 0] = tiny_vocab.bos_idx
    caption[:, 1:4] = 5
    boxes = rng.uniform(0, 0.5, size=(bs, n, 4)).astype(np.float32)
    boxes[..., 2:] += 0.3
    batch = {
        "caption_tokens": caption,
        "region_features": rng.normal(size=(bs, n, 1024)).astype(np.float32),
        "region_boxes": boxes,
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out.shape == (bs, tiny_vocab.max_caption_length, len(tiny_vocab))
    assert np.isfinite(np.asarray(out)).all()


TPU_CONFIGS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(CONFIG_DIR, "tpu", "*.yaml"))
)


def test_tpu_variants_exist_for_every_buildable_config():
    # all parity configs except the two deliberately-broken-as-shipped
    # ones (and handwritten tiny_test) get a tuned twin
    expected = {
        n for n in ALL_CONFIGS if n not in ("rstnet.yaml", "dlct-transformer.yaml")
    }
    assert set(TPU_CONFIGS) == expected


@pytest.mark.parametrize("name", TPU_CONFIGS)
def test_tpu_variant_parses_builds_and_carries_the_tuning(name, tiny_vocab):
    cfg = get_config(os.path.join(CONFIG_DIR, "tpu", name))
    # the PERF.md-validated keys (scripts/gen_configs.py::_TPU_TUNING)
    assert cfg.TRAINING.RNG_IMPL == "rbg"
    assert cfg.TRAINING.MIXED_PRECISION is True
    assert cfg.TRAINING.DECODE_DTYPE == "bfloat16"
    assert cfg.TRAINING.STEPS_PER_CALL == 4
    assert cfg.DATASET.DICT_BATCH_SIZE == 300
    assert cfg.DATASET.MAX_REGIONS == 100
    assert cfg.DATASET.CACHE_FEATURES == 2000
    # everything but the tuned keys + MODEL.NAME matches the parity twin
    base = get_config(os.path.join(CONFIG_DIR, name))
    assert cfg.MODEL.NAME == base.MODEL.NAME + "_tpu"
    assert cfg.MODEL.ARCHITECTURE == base.MODEL.ARCHITECTURE
    assert cfg.MODEL.ENCODER.to_dict() == base.MODEL.ENCODER.to_dict()
    assert cfg.MODEL.DECODER.to_dict() == base.MODEL.DECODER.to_dict()
    model = build_model(cfg.MODEL, tiny_vocab)
    assert model is not None
