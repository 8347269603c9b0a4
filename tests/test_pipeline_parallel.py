"""Pipeline-parallel correctness: pipelined stack == dense stack.

The reference has no pipeline parallelism (SURVEY.md §2.2 PP row —
documented out of scope); parallel/pipeline.py implements it beyond
parity.  These tests assert the GPipe microbatch schedule over a 'pipe'
mesh axis is numerically equivalent to the plain sequential layer loop
(models/encoders.py Encoder), forward and backward, alone and combined
with data parallelism.  Runs on the virtual 8-device CPU mesh
(tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.models.encoders import Encoder
from openviic_tpu.parallel import make_mesh
from openviic_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_encoder_apply,
    stack_layer_params,
)
from tests.helpers import model_config

BS, N_REG, D = 8, 6, 16


def _mesh(axis_sizes):
    n = int(np.prod(list(axis_sizes.values())))
    return make_mesh(axis_sizes, devices=jax.devices()[:n])


def _setup(layers):
    cfg = model_config(layers=layers).ENCODER
    enc = Encoder(cfg)
    rng = np.random.default_rng(0)
    features = jnp.asarray(rng.normal(size=(BS, N_REG, D)).astype(np.float32))
    # True = masked (reference mask convention); last row position padded
    # for half the batch, with the padded features zeroed like the loader
    pad = np.zeros((BS, N_REG), bool)
    pad[: BS // 2, -1] = True
    features = jnp.where(jnp.asarray(pad)[..., None], 0.0, features)
    padding_mask = jnp.asarray(pad)[:, None, None, :]
    params = enc.init(jax.random.PRNGKey(0), features, padding_mask)["params"]
    dense = enc.apply({"params": params}, features, padding_mask)
    return cfg, params, features, padding_mask, dense


@pytest.mark.parametrize(
    "layers,pipe,micro",
    [(4, 4, 4), (4, 4, 1), (4, 4, 8), (4, 2, 4), (8, 4, 2), (3, 1, 2)],
    ids=["p4m4", "p4m1", "p4m8", "2layers-per-stage", "l8p4", "p1"],
)
def test_pipelined_encoder_matches_dense(layers, pipe, micro):
    cfg, params, features, padding_mask, dense = _setup(layers)
    mesh = _mesh({"pipe": pipe})
    out = pipelined_encoder_apply(
        cfg, params, features, padding_mask, mesh=mesh, microbatches=micro
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_pipelined_encoder_dp_pp_mesh():
    """Combined data x pipeline parallelism on a 2x4 mesh."""
    cfg, params, features, padding_mask, dense = _setup(4)
    mesh = _mesh({"data": 2, "pipe": 4})
    out = pipelined_encoder_apply(
        cfg, params, features, padding_mask,
        mesh=mesh, microbatches=2, batch_axis="data",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_pipeline_grad_matches_dense():
    """jax.grad flows through the shard_map/ppermute schedule: param
    gradients of a scalar loss equal the dense stack's gradients."""
    cfg, params, features, padding_mask, dense_out = _setup(4)
    mesh = _mesh({"pipe": 4})
    enc = Encoder(cfg)

    def dense_loss(p):
        out = enc.apply({"params": p}, features, padding_mask)
        return jnp.sum(out**2)

    def pp_loss(p):
        out = pipelined_encoder_apply(
            cfg, p, features, padding_mask, mesh=mesh, microbatches=4
        )
        return jnp.sum(out**2)

    g_dense = jax.grad(dense_loss)(params)
    g_pp = jax.grad(pp_loss)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        ),
        g_dense,
        g_pp,
    )


def test_pipeline_apply_generic_stage():
    """pipeline_apply on a raw function stack (no flax), jitted."""
    mesh = _mesh({"pipe": 4})
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(4, D, D)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(BS, D)).astype(np.float32))

    def stage_fn(wi, h, _aux):
        return jnp.tanh(h @ wi)

    dense = x
    for i in range(4):
        dense = jnp.tanh(dense @ w[i])

    run = jax.jit(
        lambda w_, x_: pipeline_apply(
            stage_fn, w_, x_, mesh=mesh, microbatches=4
        )
    )
    np.testing.assert_allclose(np.asarray(run(w, x)), np.asarray(dense), atol=1e-6)


def test_pipeline_validation_errors():
    mesh = _mesh({"pipe": 4})
    w = jnp.zeros((3, D, D))  # 3 layers, 4 stages
    x = jnp.zeros((BS, D))
    with pytest.raises(ValueError, match="not divisible into 4 pipeline"):
        pipeline_apply(lambda p, h, a: h, w, x, mesh=mesh, microbatches=2)
    w = jnp.zeros((4, D, D))
    with pytest.raises(ValueError, match="not divisible into 3 microbatches"):
        pipeline_apply(lambda p, h, a: h, w, x, mesh=mesh, microbatches=3)


def test_stack_layer_params():
    trees = [{"a": jnp.ones((2,)) * i, "b": {"c": jnp.zeros((3,))}} for i in range(4)]
    stacked = stack_layer_params(trees)
    assert stacked["a"].shape == (4, 2)
    assert stacked["b"]["c"].shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(stacked["a"][2]), np.full(2, 2.0))
