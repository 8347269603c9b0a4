"""End-to-end trainer tests on the tiny synthetic dataset (CPU)."""

import os

import numpy as np
import pytest

from openviic_tpu.config import ConfigNode
from tests.conftest import make_dataset_config
from tests.helpers import model_config


def full_config(tmp_path, root, **model_kwargs):
    ds = make_dataset_config(root).to_dict()
    model = model_config(**model_kwargs).to_dict()
    return ConfigNode(
        {
            "TRAINER": "viTrainer",
            "DATASET": ds,
            "TRAINING": {
                "CHECKPOINT_PATH": str(tmp_path / "saved_models"),
                "LEARNING_RATE": 1.0,
                "RL_LEARNING_RATE": 5e-6,
                "WARMUP": 100,
                "SCORE": "CIDEr",
                "GET_SCORES": True,
                "TRAINING_BEAM_SIZE": 3,
                "EVALUATING_BEAM_SIZE": 2,
                "PATIENCE": 5,
            },
            "MODEL": model,
        }
    )


@pytest.fixture(scope="module")
def trainer(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer")
    cfg = full_config(tmp, tiny_dataset_dir)
    return build_trainer(cfg)


def test_xe_epoch_reduces_loss(trainer):
    losses = [trainer.train() for _ in range(4)]
    assert losses[-1] < losses[0], f"XE loss did not decrease: {losses}"


def test_evaluate_loss_and_metrics(trainer):
    val_loss = trainer.evaluate_loss(trainer.val_dataloader)
    assert np.isfinite(val_loss)
    scores = trainer.evaluate_metrics(trainer.val_dict_dataloader)
    assert "CIDEr" in scores and "BLEU" in scores and "ROUGE" in scores
    assert all(np.isfinite(v) for v in scores.values())


def test_checkpoint_save_load_roundtrip(trainer):
    import jax

    trainer.save_checkpoint(
        {"val_loss": 1.0, "best_val_score": 0.5, "patience": 1, "use_rl": False}
    )
    params_before = jax.tree.leaves(trainer.state["params"])
    step_before = trainer.state["step"]

    # mutate then reload
    trainer.state = dict(trainer.state, step=step_before + 100)
    loaded = trainer.load_checkpoint(
        os.path.join(trainer.checkpoint_path, "last_model.ckpt")
    )
    assert loaded["best_val_score"] == 0.5
    assert trainer.state["step"] == step_before
    for a, b in zip(params_before, jax.tree.leaves(trainer.state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scst_epoch_runs(trainer):
    loss = trainer.train_scst()
    assert np.isfinite(loss)
    assert trainer.scst_step is not None


def test_full_start_loop_and_predictions(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer_loop")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.start(max_epochs=2)
    assert os.path.isfile(os.path.join(tr.checkpoint_path, "last_model.ckpt"))
    assert os.path.isfile(os.path.join(tr.checkpoint_path, "best_model.ckpt"))

    tr.get_predictions(get_scores=True)
    results_file = os.path.join(tr.checkpoint_path, "test_results.json")
    assert os.path.isfile(results_file)
    import json

    with open(results_file) as f:
        data = json.load(f)
    assert "results" in data and "CIDEr" in data

    # resume: a fresh trainer picks up from last_model.  The checkpoint
    # marks its epoch *completed* — the resumed run must train the next
    # epoch label, not repeat the finished one (the reference re-trains
    # it, vi_trainer.py:166,227; deliberate deviation).
    tr2 = build_trainer(cfg)
    tr2.start(max_epochs=1)
    assert tr2.epoch == 3  # epochs 0,1 in run 1, epoch 2 in the resume
    resumed = tr2.load_checkpoint(
        os.path.join(tr2.checkpoint_path, "last_model.ckpt")
    )
    assert resumed["epoch"] == 2


def test_resume_shuffle_stream_matches_uninterrupted(
    tmp_path_factory, tiny_dataset_dir
):
    """Resuming past completed epoch e must replay exactly the permutation
    an uninterrupted run would train next.  The expectation comes from the
    *same* trainer continuing (no hand-set counters — the old version of
    this test fabricated the expected stream with the same assumption the
    code under test made, masking an off-by-one in the legacy fallback)."""
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("resume_shuffle")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.start(max_epochs=1)  # completes epoch 0

    # ground truth: the batches the uninterrupted run would train in
    # epoch 1 — iterate the *live* loader, whatever its counter truly is
    expected = [
        np.asarray(b.arrays()["caption_tokens"]).tolist()
        for b in tr.train_dataloader
    ]

    def resumed_stream(strip_loader_epochs: bool):
        tr2 = build_trainer(cfg)
        loaded = tr2.load_checkpoint(
            os.path.join(tr2.checkpoint_path, "last_model.ckpt")
        )
        assert "loader_epochs" in loaded
        if strip_loader_epochs:  # simulate a pre-loader_epochs checkpoint
            loaded = {
                k: v for k, v in loaded.items() if k != "loader_epochs"
            }
        # drive the real realignment as _start_loop does
        tr2.epoch = loaded["epoch"] + 1
        tr2._restore_loader_epochs(loaded, use_rl=loaded["use_rl"])
        return [
            np.asarray(b.arrays()["caption_tokens"]).tolist()
            for b in tr2.train_dataloader
        ]

    # exact path: counters restored from the checkpoint
    assert resumed_stream(strip_loader_epochs=False) == expected
    # legacy fallback: reconstructed from the epoch number (XE phase)
    assert resumed_stream(strip_loader_epochs=True) == expected


def test_data_parallel_training(tmp_path_factory, tiny_dataset_dir):
    """XE training sharded over the 8 virtual CPU devices."""
    import jax

    from openviic_tpu.builders import build_trainer

    assert len(jax.devices()) == 8
    tmp = tmp_path_factory.mktemp("trainer_dp")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    assert tr.mesh is not None and dict(tr.mesh.shape) == {"data": 4}
    losses = [tr.train() for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # eval + decode still work (replicated path)
    val_loss = tr.evaluate_loss(tr.val_dataloader)
    assert np.isfinite(val_loss)
    scores = tr.evaluate_metrics(tr.val_dict_dataloader)
    assert np.isfinite(scores["CIDEr"])


def test_en_trainer_ptb_postprocessing(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer_en")
    cfg = full_config(tmp, tiny_dataset_dir)
    cfg._data["TRAINER"] = "enTrainer"
    tr = build_trainer(cfg)
    gts = {"0": ["A man, walking."]}
    gens = {"0": ["A man walks!"]}
    gts2, gens2 = tr.postprocess_pairs(gts, gens)
    assert gts2["0"] == ["a man walking"]
    assert gens2["0"] == ["a man walks"]
    scores = tr.evaluate_metrics(tr.val_dict_dataloader)
    assert "CIDEr" in scores


def test_label_smoothing_loss_values():
    import jax.numpy as jnp

    from openviic_tpu.training.steps import label_smoothing_loss, nll_loss

    logp = jnp.log(jnp.full((1, 2, 4), 0.25))
    targets = jnp.array([[1, 0]])  # second position ignored (pad)
    ls = label_smoothing_loss(logp, targets, ignore_index=0, smoothing=0.1)
    nll = nll_loss(logp, targets, ignore_index=0)
    assert np.isfinite(float(ls))
    # smoothing=0 edge: loss should approach the NLL minus target entropy
    ls0 = label_smoothing_loss(logp, targets, ignore_index=0, smoothing=1e-9)
    np.testing.assert_allclose(float(ls0), float(nll), atol=1e-5)


def test_stale_frozen_params_file_rewritten(tmp_path):
    """A reused run dir with a frozen_params.ckpt from a DIFFERENT run
    (e.g. a regenerated local backbone) must be rewritten, not silently
    stitched onto the new run's trainable params."""
    import pickle

    import jax

    from openviic_tpu.training import checkpoint as ckpt

    def make_state(backbone_val):
        params = {
            "params": {
                "backbone": {"w": np.full((2, 2), backbone_val, np.float32)},
                "head": {"w": np.ones((2, 2), np.float32)},
            }
        }
        mask = {"params": {"backbone": {"w": False}, "head": {"w": True}}}
        return {
            "params": params,
            "opt_state": (np.zeros(1),),
            "step": 0,
            "rng": jax.random.PRNGKey(0),
        }, mask

    run = tmp_path / "run"
    run.mkdir()
    path = str(run / ckpt.LAST_NAME)
    frozen_path = str(run / ckpt.FROZEN_NAME)

    state1, mask = make_state(1.0)
    ckpt.save_checkpoint(path, state1, {"epoch": 0}, frozen_mask=mask)
    # simulate a fresh process starting a NEW run in the same dir with a
    # different backbone (the per-run validation cache is per-process)
    ckpt._VALIDATED_FROZEN.clear()
    state2, mask = make_state(2.0)
    ckpt.save_checkpoint(path, state2, {"epoch": 0}, frozen_mask=mask)

    with open(frozen_path, "rb") as f:
        frozen = pickle.load(f)
    (backbone_leaf,) = [v for k, v in frozen.items() if "backbone" in k]
    np.testing.assert_array_equal(backbone_leaf, np.full((2, 2), 2.0))

    # and the full checkpoint round-trips to the NEW backbone
    loaded = ckpt.load_checkpoint(path, state2["params"], None)
    leaf = loaded["state"]["params"]["params"]["backbone"]["w"]
    np.testing.assert_array_equal(np.asarray(leaf), np.full((2, 2), 2.0))

    # unchanged saves skip the rewrite (validated-once fast path)
    before = os.path.getmtime(frozen_path)
    ckpt.save_checkpoint(path, state2, {"epoch": 1}, frozen_mask=mask)
    assert os.path.getmtime(frozen_path) == before


def test_fused_nll_matches_f32_log_softmax_on_bf16_logits():
    """fused_nll's claim is bit-equality with nll_loss(log_softmax(f32));
    that must hold for bf16 logits too (mixed-precision configs) — the
    max-shift subtraction has to upcast BEFORE subtracting."""
    import jax
    import jax.numpy as jnp

    from openviic_tpu.training.steps import fused_nll, nll_loss

    rng = np.random.default_rng(0)
    logits_f32 = jnp.asarray(
        rng.normal(scale=4.0, size=(3, 7, 33)).astype(np.float32)
    )
    targets = jnp.asarray(rng.integers(0, 33, size=(3, 7)), jnp.int32)
    for logits in (logits_f32, logits_f32.astype(jnp.bfloat16)):
        ref = nll_loss(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            targets,
            ignore_index=0,
        )
        got = fused_nll(logits, targets, ignore_index=0)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-7)


def test_checkpoint_across_phase_switch(tmp_path_factory, tiny_dataset_dir):
    """Regression: loading an XE-phase checkpoint from an RL-phase trainer
    (and vice versa) must work — the two phases have different optax state
    structures (Noam-schedule Adam vs fixed-LR Adam)."""
    import os

    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer_phase")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.train()
    tr.save_checkpoint(
        {"val_loss": 1.0, "best_val_score": 0.1, "patience": 0, "use_rl": False}
    )
    last = os.path.join(tr.checkpoint_path, "last_model.ckpt")

    # switch to RL (new opt structure), then load the XE checkpoint
    tr._ensure_scst()
    loaded = tr.load_checkpoint(last)
    assert loaded is not None and loaded["use_rl"] is False

    # save in RL phase, resume from a fresh trainer (XE-structured template)
    tr.scst_step = None
    tr._ensure_scst()
    tr.save_checkpoint(
        {"val_loss": 1.0, "best_val_score": 0.1, "patience": 0, "use_rl": True}
    )
    tr2 = build_trainer(cfg)
    loaded2 = tr2.load_checkpoint(last)
    assert loaded2 is not None and loaded2["use_rl"] is True
    # resuming mid-RL keeps the loaded opt state
    tr2._ensure_scst(reset_opt=False)
    loss = tr2.train_scst()
    assert np.isfinite(loss)


def test_pre_masking_checkpoint_opt_state_reinitialised(
    tmp_path_factory, tiny_dataset_dir
):
    """A checkpoint whose optimizer state doesn't structurally match the
    live optimizer (e.g. saved before frozen-backbone masking wrapped it
    in optax.masked) must resume with a fresh optimizer state instead of
    crashing on the first training step."""
    import pickle as pkl

    import jax

    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer_optguard")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.train()
    tr.save_checkpoint(
        {"val_loss": 1.0, "best_val_score": 0.1, "patience": 0, "use_rl": False}
    )
    last = os.path.join(tr.checkpoint_path, "last_model.ckpt")
    with open(last, "rb") as f:
        payload = pkl.load(f)
    payload["opt_state"] = {"legacy": payload["opt_state"]}  # alien structure
    with open(last, "wb") as f:
        pkl.dump(payload, f)

    tr2 = build_trainer(cfg)
    assert tr2.load_checkpoint(last) is not None
    expected = jax.eval_shape(tr2.optimizer.init, tr2.state["params"])
    assert jax.tree_util.tree_structure(
        tr2.state["opt_state"]
    ) == jax.tree_util.tree_structure(expected)
    # the reinitialised state must resume the Noam schedule at the saved
    # step, not restart its warmup (same rule as the no-opt-state path)
    import optax

    saved_step = int(tr2.state["step"])
    assert saved_step > 0
    counts = [
        int(s.count)
        for s in jax.tree.leaves(
            tr2.state["opt_state"],
            is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        )
        if isinstance(s, optax.ScaleByScheduleState)
    ]
    assert counts and all(c == saved_step for c in counts)
    loss = tr2.train()  # the step must run with the reinitialised state
    assert np.isfinite(loss)


def _dual_stream_model_config():
    """Tiny DLCT model config (region + grid streams)."""
    from tests.helpers import D_MODEL, attention_config

    return {
        "ARCHITECTURE": "DLCTTransformer",
        "NAME": "tiny_dlct",
        "DEVICE": "cpu",
        "VISION_EMBEDDING": {
            "ARCHITECTURE": "GeometricDualFeatureEmbedding",
            "D_REGION_FEATURE": 13,
            "D_GRID_FEATURE": 11,
            "D_MODEL": D_MODEL,
            "DROPOUT": 0.1,
        },
        "ENCODER": {
            "ARCHITECTURE": "DualCollaborativeLevelEncoder",
            "D_MODEL": D_MODEL,
            "LAYERS": 2,
            "HEAD": 2,
            "TRIGNOMETRIC_EMBEDDING": True,
            "SELF_ATTENTION": attention_config(
                "AugmentedGeometryScaledDotProductAttention"
            ),
            "CROSS_ATTENTION": attention_config(
                "AugmentedGeometryScaledDotProductAttention"
            ),
        },
        "DECODER": {
            "ARCHITECTURE": "Decoder",
            "D_MODEL": D_MODEL,
            "LAYERS": 2,
            "ATTENTION": {
                "D_MODEL": D_MODEL,
                "SELF_ATTENTION": attention_config(can_be_stateful=True),
                "ENC_ATTENTION": attention_config(),
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "UsualEmbedding",
                "D_MODEL": D_MODEL,
                "D_EMBEDDING": 10,
                "WORD_EMBEDDING": None,
                "WORD_EMBEDDING_CACHE": None,
                "DROPOUT": 0.1,
            },
        },
    }


def test_dlct_trainer_end_to_end(tmp_path_factory, tiny_dataset_dir):
    """The fixed DLCT wiring trains + evaluates end-to-end."""
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer_dlct")
    cfg = full_config(tmp, tiny_dataset_dir)
    cfg._data["MODEL"] = __import__(
        "openviic_tpu.config", fromlist=["ConfigNode"]
    ).ConfigNode(_dual_stream_model_config())
    tr = build_trainer(cfg)
    losses = [tr.train() for _ in range(2)]
    assert all(np.isfinite(l) for l in losses)
    scores = tr.evaluate_metrics(tr.val_dict_dataloader)
    assert np.isfinite(scores["CIDEr"])


def test_adaptive_decoder_trainer_end_to_end(tmp_path_factory, tiny_dataset_dir):
    """The fixed RSTNet wiring (AdaptiveDecoder + frozen LM) trains."""
    from openviic_tpu.builders import build_trainer
    from openviic_tpu.config import ConfigNode
    from tests.helpers import D_MODEL, attention_config, model_config

    tmp = tmp_path_factory.mktemp("trainer_rstnet")
    cfg = full_config(tmp, tiny_dataset_dir)
    model = model_config(decoder="AdaptiveDecoder").to_dict()
    model["DECODER"]["ADAPTIVE_ATTENTION"] = {
        "SELF_ATTENTION": attention_config(
            "AdaptiveScaledDotProductAttention", can_be_stateful=True
        ),
        "ENC_ATTENTION": attention_config("AdaptiveScaledDotProductAttention"),
    }
    model["DECODER"]["LANGUAGE_MODEL"] = {
        "ARCHITECTURE": "PhoBERTModel",
        "HIDDEN_SIZE": 16,
        "D_MODEL": D_MODEL,
        "MAX_LEN": 16,
        "VOCAB_SIZE": 64,
        "PADDING_IDX": 0,
        "BACKBONE_LAYERS": 1,
        "BACKBONE_HEADS": 2,
        "ATTENTION": attention_config(),
    }
    cfg._data["MODEL"] = ConfigNode(model)
    tr = build_trainer(cfg)
    # LM vocab must cover the caption vocab for tokens to embed
    assert len(tr.vocab) <= 64
    loss = tr.train()
    assert np.isfinite(loss)
    scores = tr.evaluate_metrics(tr.val_dict_dataloader)
    assert np.isfinite(scores["CIDEr"])

    # round 4: eval decode + deterministic SCST sampling both route the
    # precomputed language-signal table (trainer _language_table); run
    # one SCST epoch through that path.  Round 5: only the LM *backbone*
    # is frozen — proj/encoder_layer/vocab-head leaves update every
    # scst_step — so the table must be recomputed per step to stay
    # on-policy (round-4 advisor high finding); assert one table
    # computation per SCST batch.
    assert tr._frozen_mask is not None  # LM backbone is frozen
    assert tr._language_table() is not None
    tr.use_rl = True
    tr._ensure_scst()
    calls = {"n": 0}
    orig_table = tr._language_table

    def counting_table():
        calls["n"] += 1
        return orig_table()

    tr._language_table = counting_table
    rl_loss = tr.train_scst()
    tr._language_table = orig_table
    n_batches = len(tr.train_dict_dataloader)
    assert calls["n"] == n_batches, (
        f"language table computed {calls['n']}x for {n_batches} SCST "
        "batches — sampling must be on-policy (fresh table per step)"
    )
    assert np.isfinite(rl_loss)


def test_scst_with_device_reward(tmp_path_factory, tiny_dataset_dir):
    """TRAINING.DEVICE_REWARD runs SCST with the on-device CIDEr."""
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("trainer_devreward")
    cfg = full_config(tmp, tiny_dataset_dir)
    cfg.TRAINING._data["DEVICE_REWARD"] = True
    tr = build_trainer(cfg)
    loss = tr.train_scst()
    assert np.isfinite(loss)
    assert tr.device_reward is not None


def test_device_reward_on_by_default_and_matches_host(
    tmp_path_factory, tiny_dataset_dir
):
    """DEVICE_REWARD defaults on for viTrainer, and the device reward for
    the trainer's own sampled captions equals the host CIDEr path (the
    convergence-equivalence guard for flipping the default)."""
    import itertools

    import jax.numpy as jnp

    from openviic_tpu.builders import build_trainer
    from openviic_tpu.training.trainer import _device_batch

    tmp = tmp_path_factory.mktemp("trainer_devreward_default")
    cfg = full_config(tmp, tiny_dataset_dir)  # no DEVICE_REWARD key at all
    tr = build_trainer(cfg)
    tr._ensure_scst(reset_opt=False)
    assert tr.device_reward is not None  # default on

    beam = tr.training_beam_size
    items = next(iter(tr.train_dict_dataloader))
    batch = _device_batch(items)
    outs, _ = tr.beam_searcher(
        tr.state["params"], batch, beam_size=beam, out_size=beam
    )
    bs = outs.shape[0]
    sampled_dev = outs.reshape(bs * beam, -1)
    sampled = np.asarray(sampled_dev)

    refs = list(items["captions"])
    n_ref_max = max(len(r) for r in refs)
    r_max = max((len(c.split()) for r in refs for c in r), default=1)
    ids, idf, tok_valid, ref_valid = tr.device_reward.encode_refs(
        refs, n_ref_max, r_max
    )
    device = np.asarray(
        tr._device_score(
            sampled_dev, jnp.asarray(ids), jnp.asarray(idf),
            jnp.asarray(tok_valid), jnp.asarray(ref_valid), beam_size=beam,
        )
    ).reshape(bs, beam)

    caps_gen = tr.vocab.decode_caption(sampled, join_words=True)
    caps_gt = list(itertools.chain(*([a] * beam for a in items["captions"])))
    gens = {f"{i}": [c] for i, c in enumerate(caps_gen)}
    gts = {f"{i}": c for i, c in enumerate(caps_gt)}
    host = tr.train_cider.compute_score(gts, gens)[1].astype(np.float32)
    np.testing.assert_allclose(device, host.reshape(bs, beam), atol=1e-4)


def test_max_regions_pins_static_shapes(tmp_path_factory, tiny_dataset_dir):
    """DATASET.MAX_REGIONS gives every region batch one global row count
    (a single XLA compile instead of one per bucket size)."""
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("maxreg")
    cfg = full_config(tmp, tiny_dataset_dir).clone()
    cfg.DATASET.MAX_REGIONS = 48
    tr = build_trainer(cfg)
    for loader in (tr.train_dataloader, tr.train_dict_dataloader,
                   tr.val_dataloader):
        batch = next(iter(loader))
        assert batch["region_features"].shape[1] == 48
        assert batch["region_boxes"].shape[1] == 48


def test_rng_impl_rbg(tmp_path_factory, tiny_dataset_dir):
    """TRAINING.RNG_IMPL: rbg — the TPU-hardware PRNG path trains and
    evaluates (threefry mask generation is the biggest non-matmul cost of
    the XE step, PERF.md)."""
    import jax

    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("rbg")
    cfg = full_config(tmp, tiny_dataset_dir).clone()
    cfg.TRAINING.RNG_IMPL = "rbg"
    try:
        tr = build_trainer(cfg)
        loss = tr.train()
        assert np.isfinite(loss)
        val = tr.evaluate_loss(tr.val_dataloader)
        assert np.isfinite(val)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")

    cfg = full_config(tmp, tiny_dataset_dir).clone()
    cfg.TRAINING.RNG_IMPL = "mersenne"
    with pytest.raises(ValueError, match="RNG_IMPL"):
        build_trainer(cfg)


def test_graceful_preemption_checkpoint(tmp_path_factory, tiny_dataset_dir):
    """SIGTERM mid-epoch: the loop finishes the epoch, writes the regular
    checkpoint, and exits; resume picks up from it."""
    import os as _os
    import signal as _signal

    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("preempt")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)

    orig_train = tr.train

    def train_and_signal():
        out = orig_train()
        _os.kill(_os.getpid(), _signal.SIGTERM)
        return out

    tr.train = train_and_signal
    tr.start(max_epochs=5)  # would run 5 epochs if not preempted
    assert tr.epoch == 0  # stopped after the first (signalled) epoch
    ckpt = _os.path.join(tr.checkpoint_path, tr._ckpt_io.LAST_NAME)
    assert _os.path.exists(ckpt)
    # handlers restored
    assert _signal.getsignal(_signal.SIGTERM) == _signal.SIG_DFL


def test_rbg_checkpoint_resume_roundtrip(tmp_path_factory, tiny_dataset_dir):
    """RNG_IMPL rbg keys ((4,) uint32) survive checkpoint save/restore and
    the resumed trainer keeps training."""
    import jax

    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("rbgresume")
    cfg = full_config(tmp, tiny_dataset_dir).clone()
    cfg.TRAINING.RNG_IMPL = "rbg"
    try:
        tr = build_trainer(cfg)
        tr.start(max_epochs=1)

        tr2 = build_trainer(cfg)
        loaded = tr2.load_checkpoint(
            os.path.join(tr2.checkpoint_path, tr2._ckpt_io.LAST_NAME)
        )
        assert loaded is not None and loaded["epoch"] == 0
        loss = tr2.train()
        assert np.isfinite(loss)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_grain_loader_with_max_regions(tmp_path_factory, tiny_dataset_dir):
    """DATASET.LOADER grain + DATASET.MAX_REGIONS compose: grain batches
    come out at the pinned static shape."""
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("grainmax")
    cfg = full_config(tmp, tiny_dataset_dir).clone()
    cfg.DATASET.LOADER = "grain"
    cfg.DATASET.MAX_REGIONS = 48
    tr = build_trainer(cfg)
    batch = next(iter(tr.train_dataloader))
    assert batch["region_features"].shape[1] == 48
    loss = tr.train()
    assert np.isfinite(loss)


def test_frozen_backbone_masked_optimizer_and_split_checkpoint(
    tmp_path_factory, tiny_dataset_dir
):
    """RSTNet-style frozen LM backbones: (a) no Adam moments are allocated
    for backbone params (their grads are structurally zero via
    stop_gradient — carrying f32 m+v for a phobert-scale backbone tripled
    checkpoint size); (b) the native checkpoint saves frozen leaves ONCE
    (frozen_params.ckpt) and per-epoch files carry only trainable leaves;
    (c) the split checkpoint roundtrips exactly, backbone included."""
    import jax
    import os
    import pickle

    from openviic_tpu.builders import build_trainer
    from openviic_tpu.config import ConfigNode
    from openviic_tpu.training.optim import frozen_param_mask
    from tests.helpers import D_MODEL, attention_config, model_config

    tmp = tmp_path_factory.mktemp("trainer_frozen_split")
    cfg = full_config(tmp, tiny_dataset_dir)
    model = model_config(decoder="AdaptiveDecoder").to_dict()
    model["DECODER"]["ADAPTIVE_ATTENTION"] = {
        "SELF_ATTENTION": attention_config(
            "AdaptiveScaledDotProductAttention", can_be_stateful=True
        ),
        "ENC_ATTENTION": attention_config("AdaptiveScaledDotProductAttention"),
    }
    model["DECODER"]["LANGUAGE_MODEL"] = {
        "ARCHITECTURE": "PhoBERTModel",
        "HIDDEN_SIZE": 16,
        "D_MODEL": D_MODEL,
        "MAX_LEN": 16,
        "VOCAB_SIZE": 64,
        "PADDING_IDX": 0,
        "BACKBONE_LAYERS": 1,
        "BACKBONE_HEADS": 2,
        "ATTENTION": attention_config(),
    }
    cfg._data["MODEL"] = ConfigNode(model)
    tr = build_trainer(cfg)

    # (a) optimizer masking: no moment leaves for the backbone subtree
    mask = frozen_param_mask(tr.state["params"])
    assert mask is not None
    n_trainable = sum(bool(m) for m in jax.tree.leaves(mask))
    n_total = len(jax.tree.leaves(tr.state["params"]))
    assert n_trainable < n_total
    n_opt_arrays = len(
        [x for x in jax.tree.leaves(tr.state["opt_state"]) if hasattr(x, "shape")]
    )
    # adam: m + v per trainable leaf (+ count scalars)
    assert n_opt_arrays <= 2 * n_trainable + 2

    # one step so moments are non-trivial, then save
    loss = tr.train()
    assert np.isfinite(loss)
    tr.save_checkpoint({"patience": 0, "use_rl": False, "best_val_score": 0.0})

    ckpt_dir = tr.checkpoint_path
    frozen_file = os.path.join(ckpt_dir, "frozen_params.ckpt")
    last_file = os.path.join(ckpt_dir, "last_model.ckpt")
    assert os.path.isfile(frozen_file)
    with open(last_file, "rb") as f:
        payload = pickle.load(f)
    assert payload["frozen_file"] == "frozen_params.ckpt"
    assert payload["params"] is None
    assert all("backbone" not in k for k in payload["params_trainable"])

    # (c) roundtrip: params (incl. backbone) and opt_state equal
    before = jax.tree.map(np.asarray, tr.state["params"])
    before_opt = jax.tree.map(
        np.asarray,
        [x for x in jax.tree.leaves(tr.state["opt_state"]) if hasattr(x, "shape")],
    )
    tr.load_checkpoint(last_file)
    after = jax.tree.map(np.asarray, tr.state["params"])
    jax.tree.map(np.testing.assert_array_equal, before, after)
    after_opt = jax.tree.map(
        np.asarray,
        [x for x in jax.tree.leaves(tr.state["opt_state"]) if hasattr(x, "shape")],
    )
    for b, a in zip(before_opt, after_opt):
        np.testing.assert_array_equal(b, a)
