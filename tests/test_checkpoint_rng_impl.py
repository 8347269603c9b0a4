"""Checkpoint PRNG-impl portability (round-4 fix): an RNG_IMPL: rbg
TPU run's checkpoint must load in a process whose default impl is
threefry (serving, predict.py) — the loader infers the impl from the
key-data shape instead of trusting the process default."""

import numpy as np
import jax

from openviic_tpu.training import checkpoint as ckpt


def _roundtrip(tmp_path, key):
    state = {
        "params": {"w": np.ones((2, 2), np.float32)},
        "opt_state": {"m": np.zeros(2, np.float32)},
        "step": 3,
        "rng": key,
    }
    path = str(tmp_path / "model.ckpt")
    ckpt.save_checkpoint(path, state, extras={})
    return ckpt.load_checkpoint(path, state["params"], state["opt_state"])


def test_rbg_checkpoint_loads_under_default_impl(tmp_path):
    rbg_key = jax.random.key(0, impl="rbg")
    loaded = _roundtrip(tmp_path, rbg_key)
    restored = loaded["state"]["rng"]
    assert jax.random.key_impl(restored) == jax.random.key_impl(rbg_key)
    np.testing.assert_array_equal(
        jax.random.key_data(restored), jax.random.key_data(rbg_key)
    )


def test_threefry_checkpoint_roundtrip(tmp_path):
    key = jax.random.PRNGKey(7)
    loaded = _roundtrip(tmp_path, key)
    np.testing.assert_array_equal(
        jax.random.key_data(loaded["state"]["rng"]), jax.random.key_data(key)
    )
