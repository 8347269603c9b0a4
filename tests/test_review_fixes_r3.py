"""Regression tests for the round-3 self-review findings.

1. Split-checkpoint internals must not leak into extras: a
   load -> resave-with-loaded-extras cycle (the rewrite pattern used by
   the lifecycle dryrun) previously smuggled a stale
   ``params_trainable``/``frozen_file`` pair into a full checkpoint,
   which a later load silently preferred over the fresh msgpack params.
2. Continuing from a migrated checkpoint with no optimizer payload must
   resume the Noam schedule at the saved step, not restart the warmup
   (``optax.scale_by_schedule`` drives the LR off its internal count).
3. An explicit beam-select-attention block size that does not divide the
   batch must raise instead of silently leaving output rows unwritten.
"""

import numpy as np
import pytest

import jax


def _split_state(head_val):
    params = {
        "params": {
            "backbone": {"w": np.full((2, 2), 7.0, np.float32)},
            "head": {"w": np.full((2, 2), head_val, np.float32)},
        }
    }
    mask = {"params": {"backbone": {"w": False}, "head": {"w": True}}}
    return {
        "params": params,
        "opt_state": (np.zeros(1),),
        "step": 0,
        "rng": jax.random.PRNGKey(0),
    }, mask


def test_split_checkpoint_extras_do_not_leak(tmp_path):
    from openviic_tpu.training import checkpoint as ckpt

    run = tmp_path / "run"
    run.mkdir()
    path = str(run / ckpt.LAST_NAME)

    state1, mask = _split_state(head_val=1.0)
    ckpt.save_checkpoint(path, state1, {"epoch": 0}, frozen_mask=mask)
    loaded = ckpt.load_checkpoint(path, state1["params"], None)
    assert "params_trainable" not in loaded and "frozen_file" not in loaded

    # rewrite cycle (the forced-patience rewrite in __graft_entry__):
    # resave with the loaded extras but NEW params, as a full checkpoint
    extras = {k: v for k, v in loaded.items() if k != "state"}
    state2, _ = _split_state(head_val=2.0)
    ckpt.save_checkpoint(path, state2, extras)  # no frozen_mask: full save
    again = ckpt.load_checkpoint(path, state2["params"], None)
    leaf = np.asarray(again["state"]["params"]["params"]["head"]["w"])
    np.testing.assert_array_equal(leaf, np.full((2, 2), 2.0))


def test_fast_forward_schedule_resumes_noam_step():
    import optax

    from openviic_tpu.training.optim import (
        fast_forward_schedule,
        make_optimizer,
        noam_schedule,
    )

    opt = make_optimizer(d_model=64, warmup=100, base_lr=1.0)
    params = {"w": np.ones((3,), np.float32)}
    fresh = opt.init(params)
    ff = fast_forward_schedule(fresh, 3000)

    counts = [
        s.count
        for s in jax.tree.leaves(
            ff, is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState)
        )
        if isinstance(s, optax.ScaleByScheduleState)
    ]
    assert counts and all(int(c) == 3000 for c in counts)

    # the APPLIED update uses the resumed (decayed) LR, not the warmup LR:
    # with zero fresh moments and count=0 Adam bias correction, the first
    # update for a constant gradient is exactly -lr(count) * sign-ish;
    # compare ff vs fresh update magnitudes against the schedule ratio
    g = {"w": np.full((3,), 0.5, np.float32)}
    upd_ff, _ = opt.update(g, ff, params)
    upd_fresh, _ = opt.update(g, fresh, params)
    sched = noam_schedule(64, 100, 1.0)
    ratio = float(sched(3000)) / float(sched(0))
    got = float(upd_ff["w"][0]) / float(upd_fresh["w"][0])
    np.testing.assert_allclose(got, ratio, rtol=1e-5)


def test_attn_block_must_divide_batch():
    pytest.importorskip("jax.experimental.pallas")
    import jax.numpy as jnp

    from openviic_tpu.ops.beam_select_attention import beam_select_attention

    b_s, n_beams, L, h, d = 6, 2, 4, 2, 8
    N = b_s * n_beams
    q = jnp.zeros((N, 1, h, d), jnp.float32)
    k = jnp.zeros((N, L, h, d), jnp.float32)
    v = jnp.zeros((N, L, h, d), jnp.float32)
    anc = jnp.zeros((b_s, n_beams, L), jnp.int32)
    pm = jnp.ones((N, L, 1, 1), jnp.float32)
    with pytest.raises(ValueError, match="must divide"):
        beam_select_attention(q, k, v, anc, pm, block_images=4)


def test_multihost_keeps_orbax_backend_collective():
    # round-4 fix (VERDICT r3 weak #4): multi-host runs KEEP the async
    # orbax backend — every process calls save (orbax writes per-host
    # shards and runs the commit barriers itself), so the trainer must
    # flag the backend collective instead of falling back to native
    from openviic_tpu.config.node import ConfigNode
    from openviic_tpu.training import checkpoint as ckpt
    from openviic_tpu.training.trainer import BaseTrainer

    class _Shim:
        _ckpt_io = BaseTrainer._ckpt_io
        _ckpt_collective = BaseTrainer._ckpt_collective

    shim = _Shim()
    shim.config = ConfigNode({"TRAINING": {"CHECKPOINT_BACKEND": "orbax"}})
    shim._multihost = True
    assert type(shim._ckpt_io) is type(ckpt.get_backend("orbax"))
    assert shim._ckpt_collective  # all processes must call into it

    native = _Shim()
    native.config = ConfigNode({"TRAINING": {"CHECKPOINT_BACKEND": "native"}})
    native._multihost = True
    assert not native._ckpt_collective  # host-0-gated single writer

    single = _Shim()
    single.config = ConfigNode({"TRAINING": {"CHECKPOINT_BACKEND": "orbax"}})
    single._multihost = False
    assert type(single._ckpt_io) is type(ckpt.get_backend("orbax"))
    assert not single._ckpt_collective
