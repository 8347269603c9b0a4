"""Orbax checkpoint backend (async, multi-host-safe).

The native backend (training/checkpoint.py) writes a single pickle file —
exactly the reference's ``last_model.pth`` convention
(trainers/base_trainer.py:138-153).  This backend keeps the same last/best
two-slot semantics but stores arrays through Orbax:

 - **async saves**: the device->host copy happens synchronously, the disk
   write in a background thread (``AsyncCheckpointer``), so training
   continues while the checkpoint lands;
 - **multi-host coordination**: Orbax serialises distributed arrays
   correctly under ``jax.distributed`` (each host writes its shards; a
   barrier finalises the commit), which a host-local pickle cannot do.
   Under ``jax.process_count() > 1`` this backend is COLLECTIVE
   (``MULTIHOST_COLLECTIVE``): every process must call
   ``save_checkpoint``/``load_checkpoint``/``copy``/``wait`` in lockstep
   — the trainer routes around its host-0-gated single-writer scheme for
   such backends (training/trainer.py ``save_checkpoint``).  Filesystem
   mutations outside Orbax (staging cleanup, the commit swap, best-model
   copies) run on process 0 only, fenced by global barriers, and assume
   a filesystem shared across hosts (the standard TPU-pod setup);
 - **atomic commit**: Orbax writes to a temp dir and renames on finalise,
   same crash-safety as the native tmp+rename.

Payload layout (CompositeCheckpointHandler):
 - item ``state``: {params, opt_leaves (flat), step, rng key data} via
   StandardSave — params are plain flax dicts so they round-trip without a
   template; the optimizer state's *Python* structure (optax NamedTuples,
   which differ between the XE and SCST phases) is carried as a pickled
   treedef in ``meta`` and re-attached by unflattening, keeping the
   phase-independent restore the trainer relies on;
 - item ``meta``: JSON extras + numpy RNG state + the treedef (base64).
"""

from __future__ import annotations

import base64
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

from openviic_tpu.training.checkpoint import _wrap_rng as _ckpt_wrap_rng

LAST_NAME = "last_model.orbax"
BEST_NAME = "best_model.orbax"


def _np_rng_to_json(state) -> list:
    kind, keys, pos, has_gauss, cached = state
    return [kind, np.asarray(keys).tolist(), int(pos), int(has_gauss), float(cached)]


def _np_rng_from_json(data) -> tuple:
    kind, keys, pos, has_gauss, cached = data
    return (kind, np.asarray(keys, dtype=np.uint32), int(pos), int(has_gauss),
            float(cached))


class OrbaxBackend:
    LAST_NAME = LAST_NAME
    BEST_NAME = BEST_NAME
    # every process participates in save/load/copy/wait (lockstep); the
    # trainer must NOT host-0-gate calls into a collective backend
    MULTIHOST_COLLECTIVE = True

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
        self._multihost = jax.process_count() > 1
        self._primary = jax.process_index() == 0
        self._sync_n = 0

    def _sync(self, tag: str) -> None:
        """Global barrier fencing a process-0-only filesystem mutation.
        Called in lockstep on every process (collective contract above);
        the counter keeps successive barrier names distinct so a skewed
        caller fails loudly in sync_global_devices instead of silently
        pairing the wrong barriers."""
        if not self._multihost:
            return
        from jax.experimental import multihost_utils

        self._sync_n += 1
        multihost_utils.sync_global_devices(f"ov_orbax_{tag}_{self._sync_n}")

    def save_checkpoint(
        self, path: str, state: Dict[str, Any], extras: Dict[str, Any],
        frozen_mask=None,
    ) -> None:
        """Save asynchronously to ``<path>.staging``; the committed staging
        dir is swapped into ``path`` at the next sync point (``wait``).

        ``frozen_mask`` (the native backend's frozen-split) is accepted
        but ignored: the async writer already overlaps the device→host
        fetch with training, so the split's win is much smaller here.

        Orbax's ``force=True`` deletes the destination *before* the async
        commit lands, which would leave no resume point if the process died
        mid-save; the staging swap keeps the previous checkpoint intact
        through the whole write (``load_checkpoint`` also falls back to a
        committed staging dir, so even a crash between the swap's rmtree
        and rename loses nothing)."""
        ocp = self._ocp
        self.wait()  # finalise any previous save + its pending swap
        opt_leaves = jax.tree.leaves(state["opt_state"])
        opt_treedef = jax.tree.structure(state["opt_state"])
        payload = {
            "params": state["params"],
            "opt_leaves": list(opt_leaves),
            "step": state["step"],
            "rng": jax.random.key_data(state["rng"]),
        }
        meta = {
            "numpy_rng_state": _np_rng_to_json(np.random.get_state()),
            "opt_treedef": base64.b64encode(pickle.dumps(opt_treedef)).decode(),
            **extras,
        }
        staging = os.path.abspath(path) + ".staging"
        if self._primary and os.path.isdir(staging):
            shutil.rmtree(staging)
        self._sync("staging_clean")  # no host writes into a dir being deleted
        self._ckptr.save(
            staging,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        self._pending_swap = (staging, os.path.abspath(path))

    def _finish_swap(self) -> None:
        pending = getattr(self, "_pending_swap", None)
        if pending is None:
            return
        staging, final = pending
        self._pending_swap = None
        if self._primary and os.path.isdir(staging):
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(staging, final)
        self._sync("swap_done")  # the renamed dir is visible everywhere

    def load_checkpoint(
        self, path: str, params_template=None, opt_state_template=None
    ) -> Optional[Dict[str, Any]]:
        self.wait()
        if not os.path.isdir(path):
            # crash window fallback: a fully-committed staging dir whose
            # swap never ran (never adopt an uncommitted partial write)
            staging = path + ".staging"
            adopt = os.path.isdir(staging) and self._ocp.utils.is_checkpoint_finalized(
                staging
            )
            # every host must evaluate `adopt` against the PRE-rename
            # filesystem before the primary renames: a host checking
            # after the rename would see no staging dir, compute
            # adopt=False, skip the adopt barrier, and skew _sync_n —
            # the next collective would pair mismatched barrier names
            # and hang (round-4 advisor finding)
            self._sync("adopt_check")
            if adopt:
                if self._primary:
                    os.rename(staging, path)
                self._sync("adopt_staging")
            if not os.path.isdir(path):
                return None
        restored = self._ckptr.restore(os.path.abspath(path))
        payload, meta = restored["state"], dict(restored["meta"])
        opt_treedef = pickle.loads(base64.b64decode(meta.pop("opt_treedef")))
        opt_state = jax.tree.unflatten(opt_treedef, payload["opt_leaves"])
        np.random.set_state(_np_rng_from_json(meta.pop("numpy_rng_state")))
        state = {
            "params": payload["params"],
            "opt_state": opt_state,
            "step": int(np.asarray(payload["step"])),
            # impl-preserving wrap (see checkpoint._wrap_rng): rbg-run
            # checkpoints must load in default-impl processes too
            "rng": _ckpt_wrap_rng(np.asarray(payload["rng"])),
        }
        return {"state": state, **meta}

    def copy(self, src: str, dst: str) -> None:
        """best_model <- last_model (the reference's file copy on improve)."""
        self.wait()  # the async save of `src` must have committed + swapped
        if self._primary:
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)
        self._sync("copy_done")

    def exists(self, path: str) -> bool:
        return os.path.isdir(path) or os.path.isdir(path + ".staging")

    def wait(self) -> None:
        self._ckptr.wait_until_finished()  # this host's shards committed
        if getattr(self, "_pending_swap", None) is not None:
            # every host's async write must land before process 0 renames
            self._sync("write_done")
        self._finish_swap()
