"""One-command migration of reference checkpoints into this framework.

A user of the reference (hieunghia-pat/OpenViIC) has, per run directory
(trainers/base_trainer.py:26-33,138-153):

 - ``best_model.pth`` / ``last_model.pth`` — torch payloads with the
   model under ``state_dict`` plus epoch/optimizer/scheduler/RNG states
   and the trainer phase flags (``use_rl``, ``patience``,
   ``best_val_score``, ``val_loss`` from trainers/vi_trainer.py:213-218);
 - ``vocab.bin`` — the ``data_utils.vocab.Vocab`` instance pickled once.

:func:`import_reference_checkpoint` converts such a run directory into
this framework's native layout (``best_model.ckpt`` + ``vocab.bin``), so
``predict.py``, ``serve.py``, ``train.py --eval-only`` and continued
training (XE or SCST) all work on the migrated weights.  Weight-name
mapping is :mod:`openviic_tpu.compat.torch_import` — the same converter
the reference-parity test suite proves token-exact for every
architecture family.

The reference's ``vocab.bin`` pickle references the reference's own
class path; :func:`load_reference_vocab` unpickles it with a class shim
and rebuilds this framework's :class:`~openviic_tpu.data.vocab.Vocab`
from the attribute bag (the two classes share their attribute surface by
design), so migration does not require the original annotation JSONs.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "load_reference_vocab",
    "dummy_batch",
    "import_reference_checkpoint",
]

# attributes a usable Vocab must carry (encode/decode + trainer needs)
_REQUIRED_VOCAB_ATTRS = (
    "itos",
    "stoi",
    "padding_idx",
    "bos_idx",
    "eos_idx",
    "unk_idx",
    "padding_token",
    "bos_token",
    "eos_token",
    "unk_token",
    "max_caption_length",
)


class _RefVocabStub:
    """Attribute bag standing in for the reference's Vocab on unpickle."""


class _RefUnpickler(pickle.Unpickler):
    """Unpickler mapping the reference's Vocab class onto a local stub.

    Everything else (defaultdict, Counter, torch tensors) resolves
    normally — torch is importable in this environment, so tensor
    payloads inside the pickle reconstruct fine.
    """

    def find_class(self, module: str, name: str):
        if (
            name == "Vocab"
            and module.rsplit(".", 1)[-1] == "vocab"
            and not module.startswith("openviic_tpu")
        ):
            return _RefVocabStub
        return super().find_class(module, name)


def _to_numpy(value: Any) -> Any:
    if hasattr(value, "detach"):  # torch tensor
        return value.detach().cpu().numpy()
    return value


def load_reference_vocab(path: str):
    """Load a reference ``vocab.bin`` into this framework's Vocab.

    The returned object is a real :class:`openviic_tpu.data.vocab.Vocab`
    (constructed without re-scanning annotation JSONs) whose attributes
    are copied from the pickled reference instance; torch tensors
    (``word_embeddings``) are converted to numpy.
    """
    from openviic_tpu.data.vocab import Vocab

    with open(path, "rb") as f:
        stub = _RefUnpickler(f).load()
    if not isinstance(stub, _RefVocabStub):
        # already a native Vocab (this framework's vocab.bin)
        if isinstance(stub, Vocab):
            return stub
        raise TypeError(f"{path} does not contain a Vocab (got {type(stub)!r})")

    vocab = object.__new__(Vocab)
    for key, value in vars(stub).items():
        setattr(vocab, key, _to_numpy(value))
    # fields the reference may not have persisted
    if not hasattr(vocab, "mapping"):
        vocab.mapping = None
    if not hasattr(vocab, "word_embeddings"):
        vocab.word_embeddings = None
    if not hasattr(vocab, "tokenizer"):
        vocab.tokenizer = None
    if not hasattr(vocab, "specials"):
        vocab.specials = [
            vocab.padding_token,
            vocab.bos_token,
            vocab.eos_token,
            vocab.unk_token,
        ]
    missing = [a for a in _REQUIRED_VOCAB_ATTRS if not hasattr(vocab, a)]
    if missing:
        raise ValueError(
            f"reference vocab at {path} lacks required attributes: {missing}"
        )
    return vocab


def dummy_batch(config, vocab) -> Dict[str, Any]:
    """Minimal fixed-shape batch for ``model.init`` (param template).

    Mirrors the serving pipeline's template batch
    (openviic_tpu/serving.py) so the produced param tree matches what
    every consumer of the checkpoint initialises against.
    """
    import jax.numpy as jnp

    vis = config.MODEL.VISION_EMBEDDING
    batch: Dict[str, Any] = {
        "caption_tokens": jnp.zeros((1, vocab.max_caption_length), jnp.int32),
    }
    if "D_FEATURE" in vis:
        batch["region_features"] = jnp.zeros((1, 8, vis.D_FEATURE))
        batch["grid_features"] = jnp.zeros((1, 8, vis.D_FEATURE))
    else:
        batch["region_features"] = jnp.zeros((1, 8, vis.D_REGION_FEATURE))
        batch["grid_features"] = jnp.zeros((1, 8, vis.D_GRID_FEATURE))
    batch["region_boxes"] = jnp.zeros((1, 8, 4))
    batch["grid_boxes"] = jnp.zeros((1, 8, 4))
    return batch


def import_reference_checkpoint(
    config,
    pth_path: str,
    out_dir: Optional[str] = None,
    vocab=None,
    vocab_bin: Optional[str] = None,
    write_last: bool = False,
    allow_missing: bool = False,
) -> Dict[str, Any]:
    """Convert a reference ``*.pth`` checkpoint into the native layout.

    Writes ``<out_dir>/best_model.ckpt`` and ``<out_dir>/vocab.bin``
    (and ``last_model.ckpt`` when ``write_last`` — enables continued
    training: the trainer re-initialises the optimizer, carries over the
    epoch/phase flags, and resumes the Noam LR schedule from the
    reference scheduler's step count).

    Vocabulary resolution order: explicit ``vocab`` object →
    ``vocab_bin`` (a reference or native pickle) → rebuild from the
    config's annotation JSONs (bit-identical to the reference's build,
    tests/test_vocab.py).

    Returns a report dict: ``out_dir``, ``missing`` (template params
    with no reference counterpart), ``unused`` (reference keys not
    mapped), ``epoch``, ``step``, and the carried phase flags.
    """
    import jax
    import torch

    from openviic_tpu.builders import build_model
    from openviic_tpu.training import checkpoint as ckpt
    from openviic_tpu.utils import setup_logger

    logger = setup_logger()

    payload = torch.load(pth_path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)

    if vocab is None:
        if vocab_bin is None:
            candidate = os.path.join(os.path.dirname(pth_path), "vocab.bin")
            if os.path.isfile(candidate):
                vocab_bin = candidate
        if vocab_bin is not None:
            vocab = load_reference_vocab(vocab_bin)
            logger.info("Adopted vocab from %s (%d tokens)", vocab_bin, len(vocab))
        else:
            from openviic_tpu.data.vocab import Vocab

            vocab = Vocab(config.DATASET)
            logger.info(
                "Rebuilt vocab from annotation JSONs (%d tokens)", len(vocab)
            )

    model = build_model(config.MODEL, vocab)
    template = model.init(jax.random.PRNGKey(0), dummy_batch(config, vocab))
    from openviic_tpu.compat.torch_import import convert_torch_state_dict

    params, missing, unused = convert_torch_state_dict(state_dict, template)
    if missing and not allow_missing:
        raise ValueError(
            "reference checkpoint is missing weights for "
            f"{len(missing)} params (pass allow_missing=True to keep "
            f"their random init): {missing[:8]}{'...' if len(missing) > 8 else ''}"
        )

    out_dir = out_dir or os.path.join(
        config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME
    )
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "vocab.bin"), "wb") as f:
        pickle.dump(vocab, f)

    # LR-schedule position: the reference's LambdaLR counts steps in
    # ``_step_count`` starting at 1 after construction; our Noam schedule
    # reads state["step"] which counts completed optimizer steps.
    sched = payload.get("scheduler") or {}
    step = max(0, int(sched.get("_step_count", 1)) - 1)

    extras = {
        key: payload[key]
        for key in ("epoch", "use_rl", "patience", "best_val_score", "val_loss")
        if key in payload
    }
    # numpy RNG round-trips through save_checkpoint (which stores the
    # *current* host state); restore the reference's saved one first so
    # the migrated checkpoint carries it forward.
    rng_state = payload.get("numpy_rng_state")
    saved_state = np.random.get_state() if rng_state is not None else None
    try:
        if rng_state is not None:
            np.random.set_state(rng_state)
        state = {
            "params": params,
            "opt_state": None,  # reference Adam moments don't map to optax
            "step": step,
            "rng": jax.random.PRNGKey(0),
        }
        best = os.path.join(out_dir, ckpt.BEST_NAME)
        ckpt.save_checkpoint(best, state, extras)
        if write_last:
            import shutil

            shutil.copyfile(best, os.path.join(out_dir, ckpt.LAST_NAME))
    finally:
        if saved_state is not None:
            np.random.set_state(saved_state)

    logger.info(
        "Imported %s -> %s (epoch %s, step %d, %d reference keys unused)",
        pth_path,
        best,
        extras.get("epoch"),
        step,
        len(unused),
    )
    return {
        "out_dir": out_dir,
        "best": best,
        "missing": missing,
        "unused": unused,
        "step": step,
        **extras,
    }
