"""Serving pipeline test: train briefly, then caption a feature directory."""

import numpy as np

from openviic_tpu.serving import CaptioningPipeline
from tests.test_trainer import full_config


def test_caption_directory(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("serving")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.start(max_epochs=1)  # produces best_model + vocab.bin

    pipeline = CaptioningPipeline(cfg, batch_size=3, use_bf16=False)
    captions = pipeline.caption_directory(str(tiny_dataset_dir / "features"))
    assert len(captions) == 8
    assert all(isinstance(c, str) for c in captions.values())

    # deterministic: captioning again gives the same strings
    captions2 = pipeline.caption_directory(str(tiny_dataset_dir / "features"))
    assert captions == captions2
