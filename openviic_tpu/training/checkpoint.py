"""Checkpoint save/load.

Reference equivalent: ``BaseTrainer.save_checkpoint/load_checkpoint``
(trainers/base_trainer.py:119-153): a single ``last_model`` file holding
model/optimizer state + RNG states + epoch + trainer flags (``use_rl``,
``patience``, ``best_val_score``, ``val_loss``); ``best_model`` is a file
copy on improvement (vi_trainer.py:220-222); the ``Vocab`` is pickled once
to ``vocab.bin`` (base_trainer.py:26-33).

Here: params/opt_state serialise with flax msgpack; the JAX PRNG key and
numpy RNG state replace the four torch RNG states.  Same last/best two-slot
convention, same auto-resume-by-default semantics.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

LAST_NAME = "last_model.ckpt"
BEST_NAME = "best_model.ckpt"


def save_checkpoint(path: str, state: Dict[str, Any], extras: Dict[str, Any]) -> None:
    """Write the single-file checkpoint (atomically via tmp+rename).

    ``opt_state`` is stored as a pickled numpy pytree (structure included)
    rather than template-matched msgpack: the XE phase (Noam schedule) and
    the SCST phase (fixed-LR Adam) have different optax state structures,
    and a load must succeed regardless of which phase the checkpoint and
    the live trainer are in."""
    payload = {
        "params": serialization.to_bytes(state["params"]),
        "opt_state": jax.tree.map(lambda x: np.asarray(x), state["opt_state"]),
        "step": int(state["step"]),
        "rng": np.asarray(jax.random.key_data(state["rng"])),
        "numpy_rng_state": np.random.get_state(),
        **extras,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


class NativeBackend:
    """The default single-file pickle backend (this module's functions)."""

    LAST_NAME = LAST_NAME
    BEST_NAME = BEST_NAME

    def save_checkpoint(self, path, state, extras):
        save_checkpoint(path, state, extras)

    def load_checkpoint(self, path, params_template=None, opt_state_template=None):
        return load_checkpoint(path, params_template, opt_state_template)

    def copy(self, src: str, dst: str) -> None:
        import shutil

        shutil.copyfile(src, dst)

    def exists(self, path: str) -> bool:
        return os.path.isfile(path)

    def wait(self) -> None:  # saves are synchronous
        pass


def get_backend(name: str = "native"):
    """Checkpoint IO backend by name: "native" (pickle) or "orbax" (async).

    Configured via ``TRAINING.CHECKPOINT_BACKEND``."""
    name = (name or "native").lower()
    if name == "orbax":
        from openviic_tpu.training.orbax_backend import OrbaxBackend

        return OrbaxBackend()
    if name == "native":
        return NativeBackend()
    raise ValueError(f"unknown checkpoint backend {name!r}")


def load_checkpoint(
    path: str, params_template, opt_state_template
) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    raw_opt = payload["opt_state"]
    if isinstance(raw_opt, bytes):  # older checkpoints: template msgpack
        if opt_state_template is not None:
            opt_state = serialization.from_bytes(opt_state_template, raw_opt)
        else:
            opt_state = None
    else:  # structural pickle — restored as-is, phase-independent
        opt_state = raw_opt
    rng = jax.random.wrap_key_data(np.asarray(payload["rng"]))
    np.random.set_state(payload["numpy_rng_state"])
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": payload["step"],
        "rng": rng,
    }
    extras = {
        k: v
        for k, v in payload.items()
        if k not in ("params", "opt_state", "step", "rng", "numpy_rng_state")
    }
    return {"state": state, **extras}
