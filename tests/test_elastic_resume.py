"""Elastic resume: a checkpoint saved under one mesh topology restores
and continues under a *different* one.

Production preemption reality: a dp4 x tp2 job may come back as dp2 x
tp4 (or single-device) after rescheduling.  The framework's checkpoint
formats are topology-free by construction — both backends persist host
numpy trees and the trainer re-places state onto the live mesh via
``shard_state`` — so resume across mesh shapes must produce the same
training trajectory as an uninterrupted run (up to cross-device
reduction reordering).  The reference has no notion of this (strictly
single-device, trainers/base_trainer.py checkpointing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openviic_tpu.parallel import batch_sharding, make_mesh, make_sharded_xe_step
from openviic_tpu.parallel.mesh import shard_state
from openviic_tpu.training.checkpoint import NativeBackend
from tests.test_tensor_parallel import _setup


def _mesh(axis_sizes):
    n = int(np.prod(list(axis_sizes.values())))
    return make_mesh(axis_sizes, devices=jax.devices()[:n])


@pytest.mark.parametrize(
    "mesh_a,mesh_b",
    [
        ({"data": 4, "model": 2}, {"data": 2, "model": 4}),
        ({"data": 4, "model": 2}, {"data": 1}),
        ({"data": 2}, {"data": 4, "model": 2}),
    ],
    ids=["retile-tp", "to-single", "scale-up"],
)
def test_resume_across_mesh_shapes(tiny_vocab, tmp_path, mesh_a, mesh_b):
    model, optimizer, host_state, batch = _setup(tiny_vocab, bs=8, sgd=True)

    mesh1 = _mesh(mesh_a)
    state = shard_state(host_state, mesh1, optimizer)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh1))
    step1 = make_sharded_xe_step(model, optimizer, mesh1)
    for _ in range(2):
        state, loss = step1(state, sharded_batch)

    # persist under mesh A (backend fetches to host numpy)
    ckpt = str(tmp_path / "last_model.ckpt")
    backend = NativeBackend()
    backend.save_checkpoint(ckpt, jax.device_get(state), {"epoch": 0})

    # uninterrupted continuation under mesh A
    state_a, loss_a = step1(state, sharded_batch)

    # elastic restore under mesh B
    loaded = backend.load_checkpoint(ckpt, params_template=host_state["params"])
    mesh2 = _mesh(mesh_b)
    restored = {
        "params": loaded["state"]["params"],
        "opt_state": loaded["state"]["opt_state"],
        "step": jnp.asarray(loaded["state"]["step"], jnp.int32),
        "rng": loaded["state"]["rng"],
    }
    restored = shard_state(restored, mesh2, optimizer)
    step2 = make_sharded_xe_step(model, optimizer, mesh2)
    state_b, loss_b = step2(
        restored, jax.device_put(batch, batch_sharding(mesh2))
    )

    # same trajectory: the step-3 loss and updated params must agree up to
    # cross-device reduction reordering (dropout is off; rng derivation is
    # fold_in(rng, step), identical on both meshes)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        jax.device_get(state_a["params"]),
        jax.device_get(state_b["params"]),
    )
    assert int(state_b["step"]) == int(state_a["step"]) == 3
