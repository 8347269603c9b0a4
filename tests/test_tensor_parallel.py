"""Tensor-parallel correctness: sharded step == single-device step.

Exercises the 'model' mesh axis (parallel/mesh.py _TP_RULES) that the
dryrun uses: the same batch and params must produce the same loss and the
same updated params on a dp x tp mesh as on one device (SURVEY.md §2.2).
Runs on the virtual 8-device CPU mesh from tests/conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.parallel import batch_sharding, make_mesh, make_sharded_xe_step
from openviic_tpu.parallel.mesh import param_shardings, shard_state
from openviic_tpu.training.optim import make_optimizer
from openviic_tpu.training.steps import make_xe_step, nll_loss
from tests.helpers import model_config
from tests.test_models_forward import make_batch


def _no_dropout(node):
    """Zero every DROPOUT in the config tree: the single-device and the
    sharded step derive their dropout rng differently (split vs fold_in),
    so determinism requires dropout off for an exact comparison."""
    if hasattr(node, "DROPOUT"):
        node.DROPOUT = 0.0
    for key in getattr(node, "keys", lambda: [])():
        child = getattr(node, key, None)
        if hasattr(child, "keys"):
            _no_dropout(child)
    return node


def _setup(tiny_vocab, bs, sgd=False):
    import optax

    cfg = _no_dropout(model_config())
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=bs)
    batch = {
        "region_features": batch["region_features"],
        "caption_tokens": batch["caption_tokens"],
        "shifted_right_caption_tokens": jnp.roll(batch["caption_tokens"], -1, axis=1)
        .at[:, -1]
        .set(tiny_vocab.padding_idx),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    # SGD for numerical-equality tests: Adam's step-1 update is
    # lr*sign(m/sqrt(v)) which flips on fp-noise-level gradient sign
    # changes, amplifying reduction-order differences across the mesh
    optimizer = (
        optax.sgd(0.05) if sgd else make_optimizer(d_model=16, warmup=100, base_lr=1.0)
    )
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.PRNGKey(7),
    }
    return model, optimizer, state, batch


@pytest.mark.parametrize(
    "axes", [{"data": 2, "model": 2}, {"data": 1, "model": 2}, {"data": 4}],
    ids=["dp2xtp2", "tp2", "dp4"],
)
def test_sharded_step_matches_single_device(tiny_vocab, axes):
    n_dev = int(np.prod(list(axes.values())))
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual multi-device mesh")
    bs = 4
    model, optimizer, state, batch = _setup(tiny_vocab, bs, sgd=True)

    # single-device reference step
    ref_step = make_xe_step(model, optimizer)
    ref_state, ref_loss = ref_step(jax.tree.map(jnp.copy, state), batch)

    mesh = make_mesh(axes, jax.devices()[:n_dev])
    sharded = shard_state(jax.tree.map(jnp.copy, state), mesh, optimizer)
    sbatch = jax.device_put(batch, batch_sharding(mesh))
    step_fn = make_sharded_xe_step(model, optimizer, mesh)
    new_state, loss = step_fn(sharded, sbatch)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_state["params"])[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state["params"])[0]
    for (path, a), (_, b) in zip(flat_ref, flat_new):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=str(path),
        )


def test_shard_state_places_adam_moments(tiny_vocab):
    """Adam mu/nu must follow the param shardings; count stays replicated
    (the optax.tree_map_params path in parallel/mesh.py shard_state)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    model, optimizer, state, batch = _setup(tiny_vocab, 2)
    mesh = make_mesh({"data": 1, "model": 2}, jax.devices()[:2])
    sharded = shard_state(state, mesh, optimizer)
    p_sh = param_shardings(state["params"], mesh)

    adam = [e for e in jax.tree.leaves(
        sharded["opt_state"], is_leaf=lambda x: hasattr(x, "mu")
    ) if hasattr(x := e, "mu")]
    assert adam, "no adam state found"
    entry = adam[0]
    flat_sh = jax.tree.leaves(p_sh)
    flat_mu = jax.tree.leaves(entry.mu)
    assert len(flat_mu) == len(flat_sh)
    for mu_leaf, sh in zip(flat_mu, flat_sh):
        assert mu_leaf.sharding.spec == sh.spec, (mu_leaf.sharding, sh)
    assert entry.count.sharding.spec == jax.sharding.PartitionSpec()


def test_tp_rules_actually_shard(tiny_vocab):
    """The 'model' axis must partition attention/FFN kernels, not just
    replicate them (guards the _TP_RULES regexes against scope renames)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    model, optimizer, state, batch = _setup(tiny_vocab, 2)
    mesh = make_mesh({"data": 1, "model": 2}, jax.devices()[:2])
    shardings = param_shardings(state["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded_paths = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, sh in flat
        if sh.spec != jax.sharding.PartitionSpec()
    ]
    assert any("fc_q" in p for p in sharded_paths), sharded_paths
    assert any("pwff" in p for p in sharded_paths), sharded_paths
    assert any("decoder/fc" in p or "fc/kernel" in p for p in sharded_paths)


def test_sharded_decode_matches_single_device(tiny_vocab):
    """Beam decode over a dp mesh must equal the single-device decode."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from openviic_tpu.decoding import beam_search

    model, optimizer, state, batch = _setup(tiny_vocab, 4)
    feats = {"region_features": batch["region_features"]}
    ref_out, ref_lp = beam_search(model, state["params"], feats, beam_size=3)

    mesh = make_mesh({"data": 4}, jax.devices()[:4])
    params = jax.device_put(
        state["params"], jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    sfeats = jax.device_put(feats, batch_sharding(mesh))
    out, lp = jax.jit(
        lambda p, b: beam_search(model, p, b, beam_size=3)
    )(params, sfeats)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp), atol=1e-5)
