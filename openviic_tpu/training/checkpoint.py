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
FROZEN_NAME = "frozen_params.ckpt"


def _flat_with_keys(tree):
    """[(keystr, leaf)] + treedef, with jax's stable key strings."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(p), v) for p, v in flat], treedef


# frozen_params files already verified (or written) by this process —
# the content check runs once per run, not once per epoch
_VALIDATED_FROZEN: set = set()


def _frozen_file_current(frozen_path: str, frozen: Dict[str, Any]) -> bool:
    """True iff ``frozen_path`` exists and holds exactly ``frozen``.

    A reused run directory can contain a stale frozen-backbone file from a
    previous run (e.g. the per-epoch checkpoints were deleted but
    ``frozen_params.ckpt`` was not, or a local stand-in backbone was
    regenerated with different weights); silently reusing it would stitch
    new trainable params onto the wrong backbone at load time.  Verified
    once per process per path; mismatch -> caller rewrites the file."""
    if frozen_path in _VALIDATED_FROZEN:
        return True
    if not os.path.exists(frozen_path):
        return False
    try:
        with open(frozen_path, "rb") as f:
            existing = pickle.load(f)
        ok = set(existing) == set(frozen) and all(
            np.array_equal(np.asarray(existing[k]), np.asarray(frozen[k]))
            for k in frozen
        )
    except Exception:
        ok = False
    if ok:
        _VALIDATED_FROZEN.add(frozen_path)
    else:
        from openviic_tpu.utils import setup_logger

        setup_logger().warning(
            "stale %s does not match the live frozen params; rewriting",
            frozen_path,
        )
    return ok


def save_checkpoint(path: str, state: Dict[str, Any], extras: Dict[str, Any],
                    frozen_mask=None) -> None:
    """Write the single-file checkpoint (atomically via tmp+rename).

    ``opt_state`` is stored as a pickled numpy pytree (structure included)
    rather than template-matched msgpack: the XE phase (Noam schedule) and
    the SCST phase (fixed-LR Adam) have different optax state structures,
    and a load must succeed regardless of which phase the checkpoint and
    the live trainer are in.

    ``frozen_mask`` (True = trainable, e.g. ``optim.frozen_param_mask``):
    frozen leaves — immutable for the whole run (a pretrained LM backbone)
    — are written ONCE to ``frozen_params.ckpt`` next to ``path``, and the
    per-epoch file carries only the trainable leaves.  With a ~49M-param
    phobert backbone this cuts the RSTNet per-epoch save from ~1.7 GB to
    ~0.6 GB of device→host traffic (the optimizer masking in
    ``optim.mask_frozen`` removes the backbone's Adam moments; this
    removes its params re-fetch)."""
    if frozen_mask is None:
        params_payload = {"params": serialization.to_bytes(state["params"])}
    else:
        leaves, _ = _flat_with_keys(state["params"])
        mask_leaves, _ = _flat_with_keys(frozen_mask)
        trainable, frozen_live = {}, {}
        for (key, leaf), (mkey, keep) in zip(leaves, mask_leaves):
            assert key == mkey, (key, mkey)
            if keep:
                trainable[key] = np.asarray(leaf)
            else:
                frozen_live[key] = leaf  # left on device: fetched at most once
        frozen_path = os.path.join(os.path.dirname(path) or ".", FROZEN_NAME)
        if frozen_path not in _VALIDATED_FROZEN:
            # one-time D2H of the backbone; later epochs skip the ~200 MB
            # fetch entirely (the whole point of the split checkpoint)
            frozen = {k: np.asarray(v) for k, v in frozen_live.items()}
            if not _frozen_file_current(frozen_path, frozen):
                tmp = frozen_path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(frozen, f)
                os.replace(tmp, frozen_path)
                _VALIDATED_FROZEN.add(frozen_path)
        params_payload = {
            "params": None,
            "params_trainable": trainable,
            "frozen_file": FROZEN_NAME,
        }
    payload = {
        **params_payload,
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


def _wrap_rng(raw: np.ndarray):
    """Re-typify saved PRNG key data, preserving its original impl.

    A checkpoint written by an ``RNG_IMPL: rbg`` TPU run carries (4,)
    key data; a process that never set the default impl (serving,
    predict.py, cross-platform eval) would crash in ``wrap_key_data``
    under threefry's (2,) expectation — infer the impl from the
    trailing shape instead of trusting the process default."""
    try:
        return jax.random.wrap_key_data(raw)
    except TypeError:
        impl = "rbg" if raw.shape[-1:] == (4,) else "threefry2x32"
        return jax.random.wrap_key_data(raw, impl=impl)


class NativeBackend:
    """The default single-file pickle backend (this module's functions)."""

    LAST_NAME = LAST_NAME
    BEST_NAME = BEST_NAME

    def save_checkpoint(self, path, state, extras, frozen_mask=None):
        save_checkpoint(path, state, extras, frozen_mask=frozen_mask)

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
    if payload.get("frozen_file"):
        # split checkpoint: trainable leaves in this file, frozen leaves in
        # the run dir's one-time frozen_params.ckpt
        frozen_path = os.path.join(
            os.path.dirname(path) or ".", payload["frozen_file"]
        )
        with open(frozen_path, "rb") as f:
            frozen = pickle.load(f)
        trainable = payload["params_trainable"]
        flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
        leaves = []
        for p, _ in flat:
            key = jax.tree_util.keystr(p)
            leaves.append(trainable[key] if key in trainable else frozen[key])
        params = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        params = serialization.from_bytes(params_template, payload["params"])
    raw_opt = payload["opt_state"]
    if isinstance(raw_opt, bytes):  # older checkpoints: template msgpack
        if opt_state_template is not None:
            opt_state = serialization.from_bytes(opt_state_template, raw_opt)
        else:
            opt_state = None
    else:  # structural pickle — restored as-is, phase-independent
        opt_state = raw_opt
    rng = _wrap_rng(np.asarray(payload["rng"]))
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
        if k
        not in (
            "params",
            "opt_state",
            "step",
            "rng",
            "numpy_rng_state",
            # split-checkpoint internals: leaking these into extras would
            # let a load -> resave-with-loaded-extras cycle smuggle a stale
            # params_trainable/frozen_file pair into a full checkpoint,
            # which a later load would silently prefer over the fresh
            # msgpack params
            "params_trainable",
            "frozen_file",
        )
    }
    return {"state": state, **extras}
