"""Orbax checkpoint backend (training/orbax_backend.py): async save/restore
round-trip, phase-independent opt_state, best-slot copy, trainer resume."""

import os

import numpy as np

from tests.conftest import make_dataset_config  # noqa: F401 (fixture deps)
from tests.test_trainer import full_config


def _orbax_config(tmp, tiny_dataset_dir):
    cfg = full_config(tmp, tiny_dataset_dir)
    cfg.TRAINING._data["CHECKPOINT_BACKEND"] = "orbax"
    return cfg


def test_orbax_roundtrip_and_phase_switch(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("orbax_ckpt")
    cfg = _orbax_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.train()
    tr.save_checkpoint(
        {"val_loss": 1.5, "best_val_score": 0.2, "patience": 1, "use_rl": False}
    )
    tr._ckpt_io.wait()
    last = os.path.join(tr.checkpoint_path, tr._ckpt_io.LAST_NAME)
    assert os.path.isdir(last)

    # fresh trainer restores params + extras + numpy RNG
    tr2 = build_trainer(cfg)
    loaded = tr2.load_checkpoint(last)
    assert loaded is not None
    assert loaded["use_rl"] is False and loaded["patience"] == 1
    assert abs(loaded["val_loss"] - 1.5) < 1e-9
    import jax

    flat1 = jax.tree.leaves(tr.state["params"])
    flat2 = jax.tree.leaves(tr2.state["params"])
    assert len(flat1) == len(flat2)
    for x, y in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)

    # opt_state keeps its optax structure (phase-independent restore)
    assert jax.tree.structure(tr2.state["opt_state"]) == jax.tree.structure(
        tr.state["opt_state"]
    )

    # RL-phase save restores into an XE-phase trainer too
    tr._ensure_scst()
    tr.save_checkpoint(
        {"val_loss": 1.0, "best_val_score": 0.3, "patience": 0, "use_rl": True}
    )
    tr._ckpt_io.wait()
    tr3 = build_trainer(cfg)
    loaded3 = tr3.load_checkpoint(last)
    assert loaded3 is not None and loaded3["use_rl"] is True
    tr3._ensure_scst(reset_opt=False)
    loss = tr3.train_scst()
    assert np.isfinite(loss)


def test_orbax_best_copy_and_step_continuity(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("orbax_best")
    cfg = _orbax_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.train()
    step_after_train = int(np.asarray(tr.state["step"]))
    assert step_after_train > 0
    tr.save_checkpoint(
        {"val_loss": 1.0, "best_val_score": 0.5, "patience": 0, "use_rl": False}
    )
    io = tr._ckpt_io
    last = os.path.join(tr.checkpoint_path, io.LAST_NAME)
    best = os.path.join(tr.checkpoint_path, io.BEST_NAME)
    io.copy(last, best)
    assert io.exists(best)

    tr2 = build_trainer(cfg)
    tr2.load_checkpoint(best)
    assert int(np.asarray(tr2.state["step"])) == step_after_train
    # training continues from the restored step
    tr2.train()
    assert int(np.asarray(tr2.state["step"])) > step_after_train
