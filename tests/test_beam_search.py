"""Beam-search parity tests.

1. KV-cache consistency: step decoding must produce the same log-probs as
   the teacher-forced forward pass on the same prefix.
2. Full-algorithm parity: the jitted lax.scan beam search must match a
   plain-numpy emulation of the reference algorithm
   (models/modules/beam_search.py:36-118 semantics: eos masking with the
   -999 continuation trick, flattened top-k, beam reordering, final sort).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.decoding import beam_search
from openviic_tpu.models.base import make_decode_cache
from tests.helpers import model_config
from tests.test_models_forward import make_batch


@pytest.fixture(scope="module")
def tiny_model(tiny_vocab):
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_step_decode_matches_teacher_forced(tiny_vocab, tiny_model):
    model, params, batch = tiny_model
    vocab = tiny_vocab
    bs = 2
    L = vocab.max_caption_length

    # a fixed "generated" sequence: bos + some real tokens + eos + pads
    rng = np.random.default_rng(1)
    tokens = np.full((bs, L), vocab.padding_idx, np.int32)
    tokens[:, 0] = vocab.bos_idx
    n_real = 4
    tokens[:, 1 : 1 + n_real] = rng.integers(4, len(vocab), size=(bs, n_real))

    memory, memory_mask = model.apply(params, batch, method=model.encoder_forward)

    # teacher-forced log-probs over the whole sequence
    tf_out = model.apply(
        params,
        dict(batch, caption_tokens=jnp.asarray(tokens)),
        method=model.__call__,
    )

    # step decoding over the same tokens
    cache = make_decode_cache(model.config.DECODER, vocab, bs)
    cache = model.apply(params, cache, memory, method=model.prepare_cache)
    for t in range(n_real + 1):
        tok_t = jnp.asarray(tokens[:, t : t + 1])
        step_lp, cache = model.apply(
            params, t, tok_t, cache, memory_mask, method=model.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(step_lp),
            np.asarray(tf_out[:, t, :]),
            atol=1e-4,
            err_msg=f"step {t} mismatch",
        )


def numpy_reference_beam_search(model, params, batch, vocab, beam_size, out_size):
    """Direct numpy port of the reference beam-search *semantics*, scoring
    each step with the teacher-forced forward pass (no KV cache)."""
    memory, memory_mask = model.apply(params, batch, method=model.encoder_forward)
    b_s = np.asarray(jax.tree.leaves(memory)[0]).shape[0]
    max_len = vocab.max_caption_length
    V = len(vocab)

    seq_mask = np.ones((b_s, beam_size, 1))
    seq_logprob = np.zeros((b_s, 1, 1))
    log_probs = []
    outputs = []
    selected_words = None
    # per-beam token prefixes fed through the full forward each step
    prefixes = np.full((b_s, 1, max_len), vocab.padding_idx, np.int32)
    prefixes[:, :, 0] = vocab.bos_idx

    def score(prefixes_flat, t):
        """log-probs of the next word at step t given prefix tokens 0..t."""
        n = prefixes_flat.shape[0]
        expanded_batch = {
            k: jnp.repeat(v, n // b_s, axis=0) for k, v in batch.items()
        }
        out = model.apply(
            params,
            dict(expanded_batch, caption_tokens=jnp.asarray(prefixes_flat)),
        )
        return np.asarray(out[:, t, :])

    for t in range(max_len):
        cur_beam_size = 1 if t == 0 else beam_size
        flat = prefixes.reshape(b_s * cur_beam_size, max_len)
        word_logprob = score(flat, t).reshape(b_s, cur_beam_size, V)
        candidate_logprob = seq_logprob + word_logprob

        if t > 0:
            mask = (
                selected_words.reshape(b_s, cur_beam_size) != vocab.eos_idx
            ).astype(float)[..., None]
            seq_mask = seq_mask * mask
            word_logprob = word_logprob * seq_mask
            old_seq_logprob = np.broadcast_to(
                seq_logprob, candidate_logprob.shape
            ).copy()
            old_seq_logprob[:, :, 1:] = -999
            candidate_logprob = (
                seq_mask * candidate_logprob + old_seq_logprob * (1 - seq_mask)
            )

        flat_cand = candidate_logprob.reshape(b_s, -1)
        order = np.argsort(-flat_cand, axis=-1, kind="stable")[:, :beam_size]
        selected_logprob = np.take_along_axis(flat_cand, order, axis=-1)
        selected_beam = order // V
        selected_words = order % V

        # reorder state
        seq_logprob = selected_logprob[..., None]
        seq_mask = np.take_along_axis(seq_mask, selected_beam[..., None], axis=1)
        outputs = [
            np.take_along_axis(o, selected_beam[..., None], axis=1) for o in outputs
        ]
        outputs.append(selected_words[..., None])

        this_word_logprob = np.take_along_axis(
            word_logprob,
            np.broadcast_to(selected_beam[..., None], (b_s, beam_size, V)),
            axis=1,
        )
        this_word_logprob = np.take_along_axis(
            this_word_logprob, selected_words[..., None], axis=2
        )
        log_probs = [
            np.take_along_axis(o, selected_beam[..., None], axis=1) for o in log_probs
        ]
        log_probs.append(this_word_logprob)

        # rebuild prefixes for the selected beams
        prefixes = np.take_along_axis(
            np.broadcast_to(prefixes, (b_s, cur_beam_size, max_len)),
            np.broadcast_to(selected_beam[..., None], (b_s, beam_size, max_len)),
            axis=1,
        ).copy()
        if t + 1 < max_len:
            prefixes[:, :, t + 1] = selected_words

    seq_logprob_final = seq_logprob[:, :, 0]
    sort_idxs = np.argsort(-seq_logprob_final, axis=1, kind="stable")
    outputs = np.concatenate(outputs, axis=-1)
    outputs = np.take_along_axis(outputs, sort_idxs[..., None], axis=1)
    log_probs_arr = np.concatenate(log_probs, axis=-1)
    log_probs_arr = np.take_along_axis(log_probs_arr, sort_idxs[..., None], axis=1)

    outputs = outputs[:, :out_size]
    log_probs_arr = log_probs_arr[:, :out_size]
    if out_size == 1:
        outputs = outputs[:, 0]
        log_probs_arr = log_probs_arr[:, 0]
    return outputs, log_probs_arr


@pytest.mark.parametrize("beam_size,out_size", [(1, 1), (3, 1), (3, 3)])
def test_beam_search_matches_reference_semantics(tiny_vocab, tiny_model, beam_size, out_size):
    model, params, batch = tiny_model
    ref_out, ref_lp = numpy_reference_beam_search(
        model, params, batch, tiny_vocab, beam_size, out_size
    )
    got_out, got_lp = beam_search(
        model, params, batch, beam_size=beam_size, out_size=out_size
    )
    np.testing.assert_array_equal(np.asarray(got_out), ref_out)
    np.testing.assert_allclose(np.asarray(got_lp), ref_lp, atol=1e-4)


def test_beam_search_emits_eos_and_decodes(tiny_vocab, tiny_model):
    model, params, batch = tiny_model
    outs, _ = beam_search(model, params, batch, beam_size=3, out_size=1)
    caps = tiny_vocab.decode_caption(np.asarray(outs))
    assert len(caps) == 2
    for c in caps:
        assert isinstance(c, str)


def test_return_probs(tiny_vocab, tiny_model):
    """return_probs yields the per-step eos-masked distributions
    (beam_search.py:68-72, 103-107 semantics)."""
    model, params, batch = tiny_model
    outs, lps, all_lps = beam_search(
        model, params, batch, beam_size=3, out_size=3, return_probs=True
    )
    L, V = tiny_vocab.max_caption_length, len(tiny_vocab)
    assert all_lps.shape == (2, 3, L, V)
    # at t=0 every beam holds the same (bos-conditioned) distribution
    np.testing.assert_allclose(
        np.asarray(all_lps[:, 0, 0]), np.asarray(all_lps[:, 1, 0]), atol=1e-6
    )
