"""Odds-and-ends robustness tests."""

import json
import os

import numpy as np
import pytest

from openviic_tpu.config import ConfigNode, get_config
from openviic_tpu.utils.metrics import MetricsLogger, StepTimer


def test_config_cli_overrides(tmp_path):
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "TRAINER: viTrainer\n"
        "DATASET:\n  FEATURE_BATCH_SIZE: 4\n  DICT_BATCH_SIZE: 4\n"
        "TRAINING:\n  WARMUP: 100\n  LEARNING_RATE: 1.0\n"
        "MODEL:\n  ARCHITECTURE: StandardTransformerUsingRegion\n"
    )
    cfg = get_config(str(cfg_file), ["TRAINING.WARMUP", "5", "MODEL.DEVICE", "tpu"])
    assert cfg.TRAINING.WARMUP == 5
    assert cfg.MODEL.DEVICE == "tpu"
    # defaults filled for omitted keys
    assert cfg.TRAINING.SCORE == "CIDEr"


def test_config_frozen_raises():
    cfg = ConfigNode({"A": 1}).freeze()
    with pytest.raises(AttributeError):
        cfg.A = 2
    clone = cfg.clone()
    clone.A = 2
    assert clone.A == 2 and cfg.A == 1


def test_config_missing_key_message():
    cfg = ConfigNode({"A": 1})
    with pytest.raises(AttributeError, match="available keys"):
        _ = cfg.MISSING


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log(1, {"loss": 2.5}, prefix="train/")
    logger.log(2, {"loss": 2.0}, prefix="train/")
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 2.5 and lines[1]["step"] == 2


def test_step_timer():
    t = StepTimer()
    t.update(10)
    assert t.rate > 0
