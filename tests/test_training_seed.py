"""TRAINING.SEED (round 4): seeds param init + the trainer rng stream.
Default 42 must keep existing runs bit-identical; different seeds give
different inits; equal seeds give equal inits."""

import jax
import numpy as np

from tests.conftest import make_dataset_config  # noqa: F401 (fixture deps)
from tests.test_trainer import full_config


def _params_sha(tr):
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tr.state["params"]):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def test_seed_controls_init(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("seed")
    default = build_trainer(full_config(tmp, tiny_dataset_dir))

    cfg42 = full_config(tmp_path_factory.mktemp("seed42"), tiny_dataset_dir)
    cfg42.TRAINING._data["SEED"] = 42
    explicit = build_trainer(cfg42)
    # explicit 42 == the (pre-round-4 hardcoded) default
    assert _params_sha(default) == _params_sha(explicit)

    cfg7 = full_config(tmp_path_factory.mktemp("seed7"), tiny_dataset_dir)
    cfg7.TRAINING._data["SEED"] = 7
    other = build_trainer(cfg7)
    assert _params_sha(other) != _params_sha(default)
    # the training rng stream is seeded too
    assert not np.array_equal(
        jax.random.key_data(other.state["rng"]),
        jax.random.key_data(default.state["rng"]),
    )
