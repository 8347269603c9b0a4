"""Device CIDEr reward vs the host scorer on SCST-shaped inputs.

The host path (trainers use it today): decode sampled ids to strings,
score against ground-truth *token lists* (which the CIDEr scorer treats as
single-token reference sentences — the reference's SCST quirk).  The
device path must match to float tolerance."""

import numpy as np
import pytest

import jax.numpy as jnp

from openviic_tpu.evaluation import Cider
from openviic_tpu.training.device_reward import DeviceCider


def host_reward(vocab, train_captions, sampled, gt_token_lists):
    cider = Cider(
        {str(i): caption for i, caption in enumerate(train_captions)}
    )
    caps_gen = vocab.decode_caption(np.asarray(sampled), join_words=True)
    gens = {str(i): [c] for i, c in enumerate(caps_gen)}
    gts = {str(i): list(g) for i, g in enumerate(gt_token_lists)}
    return cider.compute_score(gts, gens)[1]


@pytest.fixture()
def setup(tiny_vocab, tiny_dataset_dir):
    from openviic_tpu.data import FeatureDataset
    from tests.conftest import make_dataset_config

    cfg = make_dataset_config(tiny_dataset_dir)
    train = FeatureDataset(str(tiny_dataset_dir / "train.json"), tiny_vocab, cfg)
    return tiny_vocab, train.captions


def _sample_batch(vocab, rng, n=6):
    L = vocab.max_caption_length
    sampled = rng.integers(4, len(vocab), size=(n, L)).astype(np.int32)
    # realistic rows: some end with eos then pad, one empty, one with
    # specials sprinkled in
    for i in range(n):
        end = rng.integers(2, L - 1)
        sampled[i, end] = vocab.eos_idx
        sampled[i, end + 1 :] = vocab.padding_idx
    sampled[0, 0] = vocab.eos_idx  # empty caption
    sampled[1, 1] = vocab.unk_idx  # special dropped mid-caption
    return sampled


def test_device_matches_host(setup):
    vocab, train_captions = setup
    rng = np.random.default_rng(0)
    dc = DeviceCider(vocab, train_captions)

    sampled = _sample_batch(vocab, rng)
    # ground truths: the train captions themselves (token lists), repeated
    gts = [train_captions[i % len(train_captions)] for i in range(len(sampled))]

    expected = host_reward(vocab, train_captions, sampled, gts)

    max_ref = max(len(g) for g in gts)
    ref_ids, ref_idf, ref_valid = dc.encode_refs(gts, max_ref)
    got = np.asarray(
        dc.score(
            jnp.asarray(sampled), jnp.asarray(ref_ids), jnp.asarray(ref_idf),
            jnp.asarray(ref_valid),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_device_matches_host_with_oov_refs(setup):
    """Ground-truth tokens below MIN_FREQ (absent from the vocab) must
    still count toward the divisor without ever matching."""
    vocab, train_captions = setup
    rng = np.random.default_rng(1)
    dc = DeviceCider(vocab, train_captions)

    sampled = _sample_batch(vocab, rng, n=4)
    gts = [
        train_captions[0] + ["zzz_rare_token"],
        ["zzz_rare_token", "qqq_rare"],
        train_captions[1],
        train_captions[2] + ["www_unseen"],
    ]
    expected = host_reward(vocab, train_captions, sampled, gts)
    max_ref = max(len(g) for g in gts)
    ref_ids, ref_idf, ref_valid = dc.encode_refs(gts, max_ref)
    got = np.asarray(
        dc.score(
            jnp.asarray(sampled), jnp.asarray(ref_ids), jnp.asarray(ref_idf),
            jnp.asarray(ref_valid),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_device_reward_is_jittable(setup):
    import jax

    vocab, train_captions = setup
    dc = DeviceCider(vocab, train_captions)
    rng = np.random.default_rng(2)
    sampled = _sample_batch(vocab, rng, n=4)
    gts = [train_captions[i] for i in range(4)]
    ref_ids, ref_idf, ref_valid = dc.encode_refs(gts, 12)
    fn = jax.jit(dc.score)
    out = fn(
        jnp.asarray(sampled), jnp.asarray(ref_ids), jnp.asarray(ref_idf),
        jnp.asarray(ref_valid),
    )
    assert np.isfinite(np.asarray(out)).all()


def host_reward_full(vocab, train_captions, sampled, gts_strings_per_row):
    """Exactly what viTrainer.train_scst computes (string gts)."""
    cider = Cider({str(i): c for i, c in enumerate(train_captions)})
    caps_gen = vocab.decode_caption(np.asarray(sampled), join_words=True)
    gens = {str(i): [c] for i, c in enumerate(caps_gen)}
    gts = {str(i): list(g) for i, g in enumerate(gts_strings_per_row)}
    return cider.compute_score(gts, gens)[1]


def test_device_full_matches_trainer_host_reward(setup):
    from openviic_tpu.training.device_reward import DeviceCiderFull

    vocab, train_captions = setup
    rng = np.random.default_rng(7)
    dc = DeviceCiderFull(vocab, train_captions)

    beam = 2
    B = 3
    # per-image reference strings, incl. an OOV token and varied counts
    refs_per_image = [
        [" ".join(train_captions[0]), " ".join(train_captions[1])],
        [" ".join(train_captions[2]) + " zzz_rare zzz_rare"],
        [" ".join(train_captions[3]), " ".join(train_captions[0]),
         " ".join(train_captions[1])],
    ]
    sampled = _sample_batch(vocab, rng, n=B * beam)
    # make one row mirror a reference closely (high-score path)
    ref0 = [vocab.stoi.get(t, vocab.unk_idx) for t in train_captions[0]]
    L = vocab.max_caption_length
    row = (ref0 + [vocab.eos_idx] + [vocab.padding_idx] * L)[:L]
    sampled[0] = np.asarray(row, np.int32)

    gts_rows = [refs_per_image[i // beam] for i in range(B * beam)]
    expected = host_reward_full(vocab, train_captions, sampled, gts_rows)

    n_ref_max = max(len(r) for r in refs_per_image)
    r_max = max(len(c.split()) for refs in refs_per_image for c in refs)
    ids, idf, tok_valid, ref_valid = dc.encode_refs(refs_per_image, n_ref_max, r_max)
    import jax

    got = np.asarray(
        jax.jit(dc.score, static_argnames=("beam_size",))(
            jnp.asarray(sampled), jnp.asarray(ids), jnp.asarray(idf),
            jnp.asarray(tok_valid), jnp.asarray(ref_valid), beam_size=beam,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    assert got[0] > 1.0  # the near-copy row scores high
