"""SCST dropout-active sampling (TRAINING.SCST_SAMPLE_DROPOUT).

The reference beam-searches under ``model.train()`` during SCST, so its
samples come from the dropout-perturbed distribution
(trainers/vi_trainer.py:126-132).  ``beam_search(train_dropout_rng=...)``
reproduces that mode; this file pins its semantics:

 - deterministic: same rng -> identical samples;
 - actually stochastic: the sampled distribution differs from the
   deterministic decode and across rngs;
 - trainer integration: an SCST epoch with the flag on runs end to end.
"""

import jax
import numpy as np
import pytest

from openviic_tpu.builders import build_model, build_trainer
from openviic_tpu.config import ConfigNode
from openviic_tpu.decoding import beam_search
from tests.conftest import make_dataset_config
from tests.helpers import model_config
from tests.test_models_forward import make_batch
from tests.test_trainer import full_config


@pytest.fixture(scope="module")
def model_and_batch(tiny_vocab):
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_dropout_sampling_deterministic_per_rng(model_and_batch):
    model, params, batch = model_and_batch
    rng = jax.random.PRNGKey(7)
    out1, lp1 = beam_search(
        model, params, batch, beam_size=3, out_size=3, train_dropout_rng=rng
    )
    out2, lp2 = beam_search(
        model, params, batch, beam_size=3, out_size=3, train_dropout_rng=rng
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp2))


def test_dropout_sampling_perturbs_scores(model_and_batch):
    model, params, batch = model_and_batch
    _, lp_det = beam_search(model, params, batch, beam_size=3, out_size=3)
    _, lp_a = beam_search(
        model, params, batch, beam_size=3, out_size=3,
        train_dropout_rng=jax.random.PRNGKey(1),
    )
    _, lp_b = beam_search(
        model, params, batch, beam_size=3, out_size=3,
        train_dropout_rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(lp_a)).all()
    # dropout is active at every attention/FFN/embedding site, so the beam
    # log-probs cannot coincide with the deterministic ones (nor across rngs)
    assert not np.allclose(np.asarray(lp_a), np.asarray(lp_det))
    assert not np.allclose(np.asarray(lp_a), np.asarray(lp_b))


def test_dropout_sampling_beam_resident_runs(model_and_batch):
    """The beam-resident fast path supports dropout (the fused Pallas step
    kernels bypass themselves in train mode at the layer gate)."""
    model, params, batch = model_and_batch
    rng = jax.random.PRNGKey(3)
    out_r, lp_r = beam_search(
        model, params, batch, beam_size=3, out_size=3,
        train_dropout_rng=rng, beam_resident=True,
    )
    assert np.isfinite(np.asarray(lp_r)).all()
    assert out_r.shape == (2, 3, model.vocab.max_caption_length)


def test_trainer_scst_epoch_with_sample_dropout(tmp_path_factory, tiny_dataset_dir):
    tmp = tmp_path_factory.mktemp("trainer_scst_dropout")
    cfg_dict = full_config(tmp, tiny_dataset_dir).to_dict()
    cfg_dict["TRAINING"]["SCST_SAMPLE_DROPOUT"] = True
    trainer = build_trainer(ConfigNode(cfg_dict))
    trainer.train()  # one XE epoch so params are sane
    loss = trainer.train_scst()
    assert np.isfinite(loss)
