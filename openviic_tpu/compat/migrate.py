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

    The canonical template-batch builder: the serving pipeline's
    ``_dummy_batch`` (openviic_tpu/serving.py) delegates here so the
    param tree a migrated checkpoint was built against always matches
    what predict/serve initialise against.
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


# reference buffer names (module-attribute component of the state_dict
# key): containers.Module.register_state decode buffers
# (attentions.py:293-294, decoders.py:92-93, base_transformer.py:16-17),
# the classic positional table (pos_embeddings.py:16) and the dead
# transformer's enc_output.  Everything else in a state_dict is a
# parameter, in model.parameters() order.
_BUFFER_NAMES = frozenset(
    {
        "running_keys",
        "running_values",
        "running_mask_self_attention",
        "running_seq",
        "encoder_features",
        "encoder_padding_mask",
        "pe",
        "enc_output",
    }
)


def convert_torch_adam_state(payload, params_template):
    """Map the reference's torch Adam moments onto an optax state.

    ``optimizer.state_dict()`` (saved at base_trainer.py:146) indexes
    parameters by their position in ``model.parameters()``; that order is
    recoverable from the model ``state_dict`` keys minus the registered
    buffers.  ``exp_avg``/``exp_avg_sq`` have their parameter's shape, so
    the weight-name converter transforms them identically (transposes,
    fc_gs stacking).  torch Adam(betas=(0.9, 0.98), eps=1e-8) and
    optax.adam(b1=0.9, b2=0.98) share the same update math and bias
    correction off a step count, so carried moments resume bit-compatibly.

    Returns ``(mu, nu, count)`` or ``None`` when the payload has no usable
    optimizer state (missing, empty, or an unexpected multi-group layout).
    """
    import numpy as np

    from openviic_tpu.compat.torch_import import convert_torch_state_dict

    opt_sd = payload.get("optimizer") or {}
    sd = payload.get("state_dict") or {}
    state = opt_sd.get("state") or {}
    groups = opt_sd.get("param_groups") or []
    if not state or not sd or len(groups) != 1:
        return None

    names = [k for k in sd if k.rsplit(".", 1)[-1] not in _BUFFER_NAMES]
    mu_sd, nu_sd, steps = {}, {}, []
    for idx, entry in state.items():
        idx = int(idx)
        if idx >= len(names):
            return None  # layout mismatch — don't guess
        if "exp_avg" not in entry or "exp_avg_sq" not in entry:
            return None
        name = names[idx]
        mu_sd[name] = entry["exp_avg"]
        nu_sd[name] = entry["exp_avg_sq"]
        step = entry.get("step", 0)
        steps.append(int(step.item() if hasattr(step, "item") else step))

    import jax

    zeros = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params_template)
    mu, _, _ = convert_torch_state_dict(mu_sd, zeros)
    nu, _, _ = convert_torch_state_dict(nu_sd, zeros)
    return mu, nu, max(steps)


def _graft_adam_state(opt_state, mu, nu, count):
    """Replace mu/nu/counts inside a freshly-initialised optax state."""
    import jax.numpy as jnp
    import optax

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(
                count=jnp.asarray(count, dtype=s.count.dtype), mu=mu, nu=nu
            )
        if isinstance(s, optax.ScaleByScheduleState):
            return s._replace(count=jnp.asarray(count, dtype=s.count.dtype))
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(rec(x) for x in s)
        return s

    return rec(opt_state)


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
    training).  When the payload includes the torch optimizer state (a
    ``last_model.pth`` does), the Adam moments and step count are
    converted into the optax state (:func:`convert_torch_adam_state`), so
    training resumes exactly where the reference run left off; otherwise
    the trainer re-initialises the optimizer and the Noam LR schedule
    resumes from the reference scheduler's step count.  Epoch, patience,
    and SCST-phase flags carry over either way.

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

    # carry the Adam moments across when the payload has them (last_model
    # checkpoints do; a bare state_dict doesn't) — training then resumes
    # with the reference's optimizer memory instead of a cold restart.
    # Skipped for frozen-backbone models (optax.masked state shape differs;
    # no reference checkpoint can contain one anyway).
    opt_state = None
    from openviic_tpu.training.optim import frozen_param_mask, make_optimizer

    if frozen_param_mask(params) is None:
        moments = convert_torch_adam_state(payload, template)
        if moments is not None:
            mu, nu, adam_count = moments
            optimizer = make_optimizer(
                config.MODEL.ENCODER.D_MODEL,
                config.TRAINING.get("WARMUP", 10000),
                config.TRAINING.get("LEARNING_RATE", 1.0),
            )
            opt_state = _graft_adam_state(
                optimizer.init(params), mu, nu, adam_count
            )
            step = adam_count  # authoritative over the scheduler's count
            logger.info(
                "Carried Adam moments across (%d optimizer steps)", adam_count
            )

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
            # converted Adam moments, or None (trainer then re-inits fresh)
            "opt_state": opt_state,
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
