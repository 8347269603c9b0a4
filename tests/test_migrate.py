"""Reference-run migration tests (compat/migrate.py).

Proves a user of the reference can bring a full run directory
(``best_model.pth`` + ``vocab.bin``, trainers/base_trainer.py:26-33,
138-153) across with one command and get token-identical decodes.
"""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from openviic_tpu.compat.migrate import (
    import_reference_checkpoint,
    load_reference_vocab,
)
from openviic_tpu.config import ConfigNode
from openviic_tpu.data.vocab import Vocab
from openviic_tpu.decoding import beam_search
from openviic_tpu.training import checkpoint as ckpt
from tests.helpers import model_config
from tests.test_models_forward import make_batch

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        import models as ref_models  # noqa: F401 — populates registries
        from builders.model_builder import META_ARCHITECTURE
        from utils.instance import Instance

        yield types.SimpleNamespace(
            META_ARCHITECTURE=META_ARCHITECTURE, Instance=Instance
        )
    finally:
        sys.path.remove(REFERENCE)


def _reference_vocab_pickle(path, n=30, max_len=12, with_embeddings=False):
    """Write a vocab.bin exactly the way the reference does: a
    ``data_utils.vocab.Vocab`` instance pickled by reference
    (base_trainer.py:31-33).  The class is synthesised here so the test
    does not depend on building a reference Vocab (which would scan
    annotation JSONs)."""
    from collections import Counter, defaultdict

    package = types.ModuleType("data_utils")
    module = types.ModuleType("data_utils.vocab")
    package.vocab = module

    class RefVocab:  # noqa: D401 — stand-in with the reference's attrs
        pass

    RefVocab.__module__ = "data_utils.vocab"
    RefVocab.__qualname__ = "Vocab"
    RefVocab.__name__ = "Vocab"
    module.Vocab = RefVocab
    sys.modules["data_utils"] = package
    sys.modules["data_utils.vocab"] = module
    try:
        v = RefVocab()
        v.tokenizer = None
        v.itos = ["<pad>", "<bos>", "<eos>", "<unk>"] + [
            f"w{i}" for i in range(n - 4)
        ]
        v.stoi = defaultdict()
        v.stoi.update({t: i for i, t in enumerate(v.itos)})
        v.freqs = Counter({f"w{i}": n - i for i in range(n - 4)})
        v.padding_token, v.bos_token = "<pad>", "<bos>"
        v.eos_token, v.unk_token = "<eos>", "<unk>"
        v.padding_idx, v.bos_idx, v.eos_idx, v.unk_idx = 0, 1, 2, 3
        v.specials = ["<pad>", "<bos>", "<eos>", "<unk>"]
        v.max_caption_length = max_len
        v.mapping = None
        v.word_embeddings = (
            torch.arange(n * 4, dtype=torch.float32).reshape(n, 4)
            if with_embeddings
            else None
        )
        with open(path, "wb") as f:
            pickle.dump(v, f)
    finally:
        del sys.modules["data_utils.vocab"]
        del sys.modules["data_utils"]


def test_load_reference_vocab_shim(tmp_path):
    path = tmp_path / "vocab.bin"
    _reference_vocab_pickle(path, with_embeddings=True)
    # the reference package is NOT importable here (module was removed) —
    # the shim unpickler must not need it
    vocab = load_reference_vocab(str(path))
    assert isinstance(vocab, Vocab)
    assert len(vocab) == 30
    assert vocab.itos[:4] == ["<pad>", "<bos>", "<eos>", "<unk>"]
    assert vocab.stoi["w0"] == 4
    assert (
        vocab.padding_idx,
        vocab.bos_idx,
        vocab.eos_idx,
        vocab.unk_idx,
    ) == (0, 1, 2, 3)
    assert vocab.max_caption_length == 12
    assert isinstance(vocab.word_embeddings, np.ndarray)
    assert vocab.word_embeddings.shape == (30, 4)
    # encode/decode must work on the adopted vocab
    ids = vocab.encode_caption(["w0", "w1", "nope"])
    assert ids.shape == (12,)
    assert ids[0] == vocab.bos_idx and ids[3] == vocab.unk_idx
    words = vocab.decode_caption(ids[None, :], join_words=False)
    assert words[0][:2] == ["w0", "w1"]


def test_load_native_vocab_passthrough(tmp_path, tiny_vocab):
    path = tmp_path / "vocab.bin"
    with open(path, "wb") as f:
        pickle.dump(tiny_vocab, f)
    vocab = load_reference_vocab(str(path))
    assert vocab is not tiny_vocab  # fresh unpickle
    assert isinstance(vocab, Vocab)
    assert vocab.itos == tiny_vocab.itos


def _reference_payload(ref_model, epoch=3, step_count=5, use_rl=False):
    """A payload shaped exactly like base_trainer.save_checkpoint's dict."""
    return {
        "torch_rng_state": torch.get_rng_state(),
        "numpy_rng_state": np.random.get_state(),
        "random_rng_state": __import__("random").getstate(),
        "epoch": epoch,
        "state_dict": ref_model.state_dict(),
        "optimizer": {},
        "scheduler": {"_step_count": step_count, "last_epoch": step_count - 1},
        "use_rl": use_rl,
        "best_val_score": 0.41,
        "patience": 1,
        "val_loss": 2.5,
    }


def test_import_reference_checkpoint_end_to_end(ref, tmp_path):
    cfg_model = model_config()  # StandardTransformerUsingRegion tiny shape
    torch.manual_seed(0)
    ref_model = ref.META_ARCHITECTURE.get("StandardTransformerUsingRegion")(
        cfg_model, _FakeLenVocab()
    )
    ref_model.eval()

    run_dir = tmp_path / "reference_run"
    run_dir.mkdir()
    _reference_vocab_pickle(run_dir / "vocab.bin")
    torch.save(_reference_payload(ref_model), run_dir / "best_model.pth")

    config = ConfigNode(
        {
            "MODEL": cfg_model,
            "TRAINING": {"CHECKPOINT_PATH": str(tmp_path / "out")},
            "DATASET": {},
        }
    )
    out_dir = tmp_path / "migrated"
    report = import_reference_checkpoint(
        config,
        str(run_dir / "best_model.pth"),
        out_dir=str(out_dir),
        write_last=True,
    )
    assert report["missing"] == []
    assert set(report["unused"]) <= {"decoder.pos_emb.weight"}
    assert report["epoch"] == 3
    assert report["step"] == 4  # LambdaLR _step_count 5 -> 4 completed steps
    assert report["use_rl"] is False
    assert (out_dir / "vocab.bin").exists()
    assert (out_dir / ckpt.LAST_NAME).exists()

    # load through the native checkpoint layer and decode
    vocab = load_reference_vocab(str(out_dir / "vocab.bin"))
    from openviic_tpu.builders import build_model
    from openviic_tpu.compat.migrate import dummy_batch

    model = build_model(config.MODEL, vocab)
    template = model.init(jax.random.PRNGKey(0), dummy_batch(config, vocab))
    loaded = ckpt.load_checkpoint(str(out_dir / ckpt.BEST_NAME), template, None)
    assert loaded is not None
    assert loaded["state"]["opt_state"] is None
    assert loaded["epoch"] == 3 and loaded["best_val_score"] == 0.41

    batch = make_batch(vocab, bs=3, d_feature=13, d_grid=11, seed=7)
    with torch.no_grad():
        ref_out, _ = ref_model.beam_search(
            ref.Instance(
                region_features=torch.tensor(
                    np.asarray(batch["region_features"]), dtype=torch.float32
                )
            ),
            batch_size=3,
            beam_size=5,
            out_size=5,
        )
    got_out, _ = beam_search(
        model,
        loaded["state"]["params"],
        {"region_features": batch["region_features"]},
        beam_size=5,
        out_size=5,
    )
    np.testing.assert_array_equal(np.asarray(got_out), ref_out.numpy())


def test_import_missing_weights_rejected(ref, tmp_path):
    cfg_model = model_config()
    torch.manual_seed(0)
    ref_model = ref.META_ARCHITECTURE.get("StandardTransformerUsingRegion")(
        cfg_model, _FakeLenVocab()
    )
    sd = ref_model.state_dict()
    sd.pop("decoder.fc.weight")  # simulate an incompatible checkpoint
    payload = _reference_payload(ref_model)
    payload["state_dict"] = sd
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    _reference_vocab_pickle(run_dir / "vocab.bin")
    torch.save(payload, run_dir / "last_model.pth")

    config = ConfigNode(
        {
            "MODEL": cfg_model,
            "TRAINING": {"CHECKPOINT_PATH": str(tmp_path / "out")},
            "DATASET": {},
        }
    )
    with pytest.raises(ValueError, match="missing weights"):
        import_reference_checkpoint(
            config, str(run_dir / "last_model.pth"), out_dir=str(tmp_path / "m")
        )
    # allow_missing keeps the random init instead
    report = import_reference_checkpoint(
        config,
        str(run_dir / "last_model.pth"),
        out_dir=str(tmp_path / "m"),
        allow_missing=True,
    )
    assert any("fc" in m for m in report["missing"])


def test_adam_moments_carried_across(ref, tmp_path):
    """A migrated last_model.pth carries the torch Adam moments into the
    optax state: one further training step from the migrated checkpoint
    matches one further torch step from the original run."""
    import optax

    from openviic_tpu.builders import build_model
    from openviic_tpu.compat.migrate import dummy_batch
    from openviic_tpu.compat.torch_import import convert_torch_state_dict
    from openviic_tpu.training.optim import make_optimizer
    from openviic_tpu.training.steps import nll_loss

    cfg_model = model_config()

    def no_dropout(node):
        if hasattr(node, "DROPOUT"):
            node.DROPOUT = 0.0
        for key in node.keys():
            child = getattr(node, key, None)
            if hasattr(child, "keys"):
                no_dropout(child)

    no_dropout(cfg_model)
    vocab_obj = _FakeLenVocab()
    torch.manual_seed(0)
    ref_model = ref.META_ARCHITECTURE.get("StandardTransformerUsingRegion")(
        cfg_model, vocab_obj
    )
    ref_model.train()

    d_model, warmup, lr = cfg_model.ENCODER.D_MODEL, 10, 1.0
    topt = torch.optim.Adam(ref_model.parameters(), lr=lr, betas=(0.9, 0.98))
    tsched = torch.optim.lr_scheduler.LambdaLR(
        topt,
        lambda step: (d_model**-0.5)
        * min((step + 1) ** -0.5, (step + 1) * warmup**-1.5),
    )
    tcrit = torch.nn.NLLLoss(ignore_index=0)

    def torch_step(seed):
        batch = make_batch(vocab_obj, bs=4, seed=seed)
        shifted = np.roll(np.asarray(batch["caption_tokens"]), -1, axis=1)
        shifted[:, -1] = 0
        tb = ref.Instance(
            caption_tokens=torch.tensor(
                np.asarray(batch["caption_tokens"]), dtype=torch.long
            ),
            region_features=torch.tensor(np.asarray(batch["region_features"])),
        )
        out = ref_model(tb)
        tloss = tcrit(
            out.reshape(-1, len(vocab_obj)),
            torch.tensor(shifted.reshape(-1), dtype=torch.long),
        )
        topt.zero_grad()
        tloss.backward()
        topt.step()
        tsched.step()
        return batch, shifted

    for seed in range(3):
        torch_step(100 + seed)

    # reference-style run dir
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    _reference_vocab_pickle(run_dir / "vocab.bin")
    payload = _reference_payload(ref_model)
    payload["optimizer"] = topt.state_dict()
    payload["scheduler"] = tsched.state_dict()
    torch.save(payload, run_dir / "last_model.pth")

    config = ConfigNode(
        {
            "MODEL": cfg_model,
            "TRAINING": {
                "CHECKPOINT_PATH": str(tmp_path / "out"),
                "WARMUP": warmup,
                "LEARNING_RATE": lr,
            },
            "DATASET": {},
        }
    )
    out_dir = tmp_path / "migrated"
    report = import_reference_checkpoint(
        config, str(run_dir / "last_model.pth"), out_dir=str(out_dir)
    )
    assert report["step"] == 3  # Adam step count, not the scheduler's

    vocab = load_reference_vocab(str(out_dir / "vocab.bin"))
    model = build_model(config.MODEL, vocab)
    template = model.init(jax.random.PRNGKey(0), dummy_batch(config, vocab))
    loaded = ckpt.load_checkpoint(str(out_dir / ckpt.BEST_NAME), template, None)
    opt_state = loaded["state"]["opt_state"]
    assert isinstance(opt_state[0], optax.ScaleByAdamState)
    assert int(opt_state[0].count) == 3
    assert any(
        float(np.abs(m).max()) > 0 for m in jax.tree.leaves(opt_state[0].mu)
    )

    # one more step on both sides from the migrated state, driven by the
    # SAME gradients (torch's), isolating the optimizer-state carry from
    # cross-framework f32 gradient noise
    optimizer = make_optimizer(d_model, warmup, lr)
    params = loaded["state"]["params"]
    batch, shifted = torch_step(500)

    tgrads = {
        n: p.grad.detach().numpy()
        for n, p in ref_model.named_parameters()
        if p.grad is not None
    }
    zeros = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), template)
    grads, _, _ = convert_torch_state_dict(tgrads, zeros)
    updates, _ = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    expected, _, _ = convert_torch_state_dict(ref_model.state_dict(), template)
    for got, want in zip(
        jax.tree.leaves(new_params), jax.tree.leaves(expected)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )
    # sanity: the jax-side loss at the migrated params matches torch's
    jb = dict(batch, shifted=np.asarray(shifted))

    def loss_fn(p):
        out = model.apply(p, jb, train=False)
        return nll_loss(out, jb["shifted"], 0)

    assert np.isfinite(float(loss_fn(params)))


def test_continue_training_from_migrated_run(ref, tmp_path, tiny_dataset_dir):
    """Full user flow: import a reference run into the trainer's
    checkpoint dir, build the trainer, and keep training — the trainer
    adopts the migrated vocab.bin, loads the converted weights, and runs
    an XE epoch with a freshly-initialised optimizer."""
    import os

    from openviic_tpu.builders import build_trainer
    from openviic_tpu.data import Vocab
    from tests.test_trainer import full_config

    cfg = full_config(tmp_path, tiny_dataset_dir)
    vocab = Vocab(cfg.DATASET)
    torch.manual_seed(0)
    ref_model = ref.META_ARCHITECTURE.get("StandardTransformerUsingRegion")(
        cfg.MODEL, vocab
    )

    run_dir = tmp_path / "reference_run"
    run_dir.mkdir()
    # the reference pickles its Vocab; here the native Vocab stands in
    # (load_reference_vocab passes it through)
    with open(run_dir / "vocab.bin", "wb") as f:
        pickle.dump(vocab, f)
    torch.save(
        _reference_payload(ref_model, epoch=1, step_count=7),
        run_dir / "best_model.pth",
    )

    report = import_reference_checkpoint(
        cfg, str(run_dir / "best_model.pth"), write_last=True
    )
    # default out_dir == the trainer's checkpoint dir
    assert report["out_dir"] == os.path.join(
        str(tmp_path / "saved_models"), cfg.MODEL.NAME
    )

    tr = build_trainer(cfg)
    assert tr.vocab.itos == vocab.itos  # adopted, not rebuilt differently
    loaded = tr.load_checkpoint(
        os.path.join(tr.checkpoint_path, ckpt.LAST_NAME)
    )
    assert loaded is not None and loaded["epoch"] == 1
    # weights actually transplanted: decoder head matches the torch fc
    got_fc = np.asarray(
        tr.state["params"]["params"]["decoder"]["fc"]["kernel"]
    )
    np.testing.assert_allclose(
        got_fc, ref_model.decoder.fc.weight.detach().numpy().T, atol=1e-6
    )
    loss = tr.train()  # continued XE training runs
    assert np.isfinite(loss)


class _FakeLenVocab:
    """Matches tests/test_reference_parity.FakeVocab (30 tokens, len 12)."""

    def __init__(self, n=30, max_len=12):
        self.itos = ["<pad>", "<bos>", "<eos>", "<unk>"] + [
            f"w{i}" for i in range(n - 4)
        ]
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        self.padding_idx, self.bos_idx, self.eos_idx, self.unk_idx = 0, 1, 2, 3
        self.max_caption_length = max_len
        self.word_embeddings = None

    def __len__(self):
        return len(self.itos)
