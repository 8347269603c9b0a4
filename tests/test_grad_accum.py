"""TRAINING.GRAD_ACCUM: microbatched gradient accumulation equals the
full-batch step exactly (token-weighted recombination, steps.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.config import ConfigNode
from openviic_tpu.training.steps import make_xe_step
from tests.helpers import model_config


def _zero_dropout(tree):
    if isinstance(tree, dict):
        return {
            k: (0.0 if k == "DROPOUT" else _zero_dropout(v))
            for k, v in tree.items()
        }
    return tree


@pytest.fixture(scope="module")
def setup(tiny_vocab):
    cfg = ConfigNode(_zero_dropout(model_config(d_feature=8).to_dict()))
    model = build_model(cfg, tiny_vocab)
    rng = np.random.default_rng(0)
    bs, L = 8, tiny_vocab.max_caption_length
    toks = rng.integers(4, len(tiny_vocab.itos), (bs, L)).astype(np.int32)
    toks[:, -2:] = tiny_vocab.padding_idx
    batch = {
        "region_features": rng.standard_normal((bs, 6, 8)).astype(np.float32),
        "caption_tokens": toks,
        "shifted_right_caption_tokens": np.roll(toks, -1, 1),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    # SGD so the one-step param delta is exactly lr * grad — with Adam the
    # first step normalizes every element to +-lr, amplifying fp reassociation
    # noise on near-zero gradients into sign flips
    optimizer = optax.sgd(0.1)
    return model, optimizer, params, batch


def _run(model, optimizer, params, batch, accum):
    state = {
        "params": jax.tree.map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": 0,
        "rng": jax.random.PRNGKey(7),
    }
    step = make_xe_step(model, optimizer, grad_accum=accum)
    state, loss = step(state, batch)
    return state, float(loss)


def test_grad_accum_matches_full_batch(setup):
    model, optimizer, params, batch = setup
    s1, l1 = _run(model, optimizer, params, batch, accum=1)
    for accum in (2, 4):
        sa, la = _run(model, optimizer, params, batch, accum=accum)
        assert np.isclose(l1, la, rtol=1e-5), (l1, la)
        flat1 = jax.tree_util.tree_leaves(s1["params"])
        flata = jax.tree_util.tree_leaves(sa["params"])
        for a, b in zip(flat1, flata):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_grad_accum_trainer_validation(tmp_path, tiny_dataset_dir):
    """Bad GRAD_ACCUM configs fail fast with clear errors."""
    from openviic_tpu.builders import build_trainer
    from tests.test_trainer import full_config

    # non-dividing accumulation factor
    cfg = full_config(tmp_path, tiny_dataset_dir).clone()
    cfg.TRAINING.GRAD_ACCUM = 7  # FEATURE_BATCH_SIZE 4 is not divisible
    with pytest.raises(ValueError, match="GRAD_ACCUM"):
        build_trainer(cfg)

    # accumulation combined with a data-parallel mesh (8 virtual devices
    # in the test env) is rejected with guidance
    cfg = full_config(tmp_path, tiny_dataset_dir).clone()
    cfg.TRAINING.GRAD_ACCUM = 2
    with pytest.raises(ValueError, match="GRAD_ACCUM"):
        build_trainer(cfg)


def test_multi_step_matches_single_steps(setup):
    """TRAINING.STEPS_PER_CALL: k updates in one dispatch produce exactly
    the same params/losses/rng as k make_xe_step calls."""
    from openviic_tpu.training.steps import make_xe_multi_step

    model, optimizer, params, batch = setup
    rng = np.random.default_rng(3)
    batches = []
    for i in range(4):
        b = {
            k: (v + 0 if v.dtype.kind == "i" else
                v + rng.standard_normal(v.shape).astype(v.dtype) * 0.01)
            for k, v in batch.items()
        }
        batches.append(b)

    def fresh_state():
        return {
            "params": jax.tree.map(jnp.copy, params),
            "opt_state": optimizer.init(params),
            "step": 0,
            "rng": jax.random.PRNGKey(7),
        }

    single = make_xe_step(model, optimizer)
    s = fresh_state()
    single_losses = []
    for b in batches:
        s, loss = single(s, b)
        single_losses.append(float(loss))

    multi = make_xe_multi_step(model, optimizer)
    sm = fresh_state()
    sm, losses = multi(sm, tuple(batches))

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(single_losses), rtol=1e-6
    )
    assert int(sm["step"]) == int(s["step"]) == 4
    np.testing.assert_array_equal(np.asarray(sm["rng"]), np.asarray(s["rng"]))
    for a, b in zip(
        jax.tree_util.tree_leaves(s["params"]),
        jax.tree_util.tree_leaves(sm["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_steps_per_call(tmp_path, tiny_dataset_dir):
    """An epoch trained with STEPS_PER_CALL=3 (uneven remainder) covers
    every batch and keeps training."""
    from openviic_tpu.builders import build_trainer
    from tests.test_trainer import full_config

    cfg = full_config(tmp_path, tiny_dataset_dir).clone()
    cfg.TRAINING.STEPS_PER_CALL = 3
    tr = build_trainer(cfg)
    n_batches = len(tr.train_dataloader)
    loss_multi = tr.train()
    assert int(tr.state["step"]) == n_batches

    # identical config at k=1 gives the identical epoch loss (same shuffle
    # stream, same rng splits — the chunked driver changes dispatch only)
    cfg1 = full_config(tmp_path, tiny_dataset_dir).clone()
    cfg1.TRAINING.STEPS_PER_CALL = 1
    tr1 = build_trainer(cfg1)
    loss_single = tr1.train()
    np.testing.assert_allclose(loss_multi, loss_single, rtol=1e-5)
