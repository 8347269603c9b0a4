"""YAML -> ConfigNode loader.

Mirrors the reference entry point ``get_config`` (reference:
configs/utils.py:4-5) but adds optional dotted CLI overrides and defaulting
for keys some shipped reference YAMLs omit (the reference's ``rstnet.yaml``
and ``dlct-transformer.yaml`` omit ``TRAINING.SCORE`` etc. — see SURVEY.md
§2.4)."""

from __future__ import annotations

from typing import List, Optional

import yaml

from openviic_tpu.config.node import ConfigNode

# Keys that at least one shipped reference YAML omits, with safe defaults so
# all nine reference configs parse & build (SURVEY.md §2.4).
_DEFAULTS = {
    ("TRAINING", "SCORE"): "CIDEr",
    ("TRAINING", "GET_SCORES"): True,
    ("TRAINING", "TRAINING_BEAM_SIZE"): 5,
    ("TRAINING", "EVALUATING_BEAM_SIZE"): 3,
    ("TRAINING", "PATIENCE"): 5,
    ("DATASET", "WORKERS"): 0,
    # "native" (data/loader.py thread pipeline) or "grain"
    # (data/grain_loader.py — host-sharded Grain pipeline for multi-host)
    ("DATASET", "LOADER"): "native",
}


def get_config(config_file: str, opts: Optional[List[str]] = None) -> ConfigNode:
    """Load a YAML config file into an attribute-access tree."""
    with open(config_file, "r") as f:
        raw = yaml.safe_load(f)
    config = ConfigNode(raw)

    for (section, key), default in _DEFAULTS.items():
        if section in config and key not in config[section]:
            config[section]._data[key] = default

    # The reference's dict-dataset loaders divide DICT_BATCH_SIZE by beam
    # size (trainers/base_trainer.py:65,71); the broken reference configs use
    # BATCH_SIZE instead of FEATURE_BATCH_SIZE/DICT_BATCH_SIZE.  Map it.
    if "DATASET" in config:
        ds = config["DATASET"]
        if "BATCH_SIZE" in ds and "FEATURE_BATCH_SIZE" not in ds:
            ds._data["FEATURE_BATCH_SIZE"] = ds["BATCH_SIZE"]
        if "BATCH_SIZE" in ds and "DICT_BATCH_SIZE" not in ds:
            ds._data["DICT_BATCH_SIZE"] = ds["BATCH_SIZE"]

    if opts:
        config.merge_from_list(list(opts))
    return config
