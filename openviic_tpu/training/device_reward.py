"""On-device CIDEr reward for SCST.

The reference's SCST reward calls host CIDEr every iteration
(trainers/vi_trainer.py:144) with a quirk that makes a device version
tractable: both the train doc-frequency corpus and the per-batch ground
truths are *token lists*, which the CIDEr scorer treats as lists of
single-token reference sentences (SURVEY.md #27 / cider_scorer.py precook
over each element).  Consequently:

 - reference n-gram vectors only ever contain unigrams (a 1-word sentence
   has no higher n-grams), so orders 2..4 contribute exactly 0;
 - document frequency reduces to "number of train captions containing the
   token" — a (vocab,)-sized table, no n-gram hashing required;
 - the Gaussian length penalty uses the *bigram* count of the hypothesis
   (counts2vec's ``length`` accumulates the n==2 order,
   cider_scorer.py:108-110) against 0 for every 1-word reference.

This module reproduces those semantics exactly on device (verified
against the host scorer in tests/test_device_reward.py), enabling a
host-round-trip-free SCST iteration.  Ground-truth tokens that fell below
the vocab MIN_FREQ are represented by sentinel id -1 with a host-side
precomputed idf (they can never match a generated token, but still count
toward reference norms and divisor).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceCider:
    """Precomputes train-split statistics; scores sampled token batches."""

    def __init__(self, vocab, train_captions: Sequence[List[str]]):
        self.vocab = vocab
        V = len(vocab)

        # df[w] = number of train caption-records whose token set contains w
        # (string-level, so OOV strings are tracked separately)
        df_str: Dict[str, float] = {}
        for caption in train_captions:
            for token in set(caption):
                df_str[token] = df_str.get(token, 0.0) + 1.0
        self.ref_len = float(np.log(max(float(len(train_captions)), 1.0)))

        df_ids = np.zeros((V,), np.float32)
        for token, count in df_str.items():
            idx = vocab.stoi.get(token)
            if idx is not None:
                df_ids[idx] = count
        self._df_str = df_str
        # idf by token id (log(N) - log(max(1, df)))
        self.idf = jnp.asarray(self.ref_len - np.log(np.maximum(1.0, df_ids)))

        # specials are dropped from decoded hypotheses (vocab.decode_caption)
        special_ids = [vocab.stoi[s] for s in vocab.specials]
        self.special_mask = jnp.asarray(
            np.isin(np.arange(V), special_ids)
        )
        self.eos_idx = vocab.eos_idx
        self.V = V

    # -- ground-truth preprocessing (host, once per batch) ----------------
    def encode_refs(
        self, captions: Sequence[List[str]], max_ref: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per image: (ref ids or -1, ref idf, valid mask), padded to max_ref."""
        n = len(captions)
        ids = np.full((n, max_ref), -1, np.int32)
        idf = np.zeros((n, max_ref), np.float32)
        valid = np.zeros((n, max_ref), bool)
        for i, caption in enumerate(captions):
            for j, token in enumerate(caption[:max_ref]):
                token_id = self.vocab.stoi.get(token)
                ids[i, j] = token_id if token_id is not None else -1
                df = self._df_str.get(token, 0.0)
                idf[i, j] = self.ref_len - np.log(max(1.0, df))
                valid[i, j] = True
        return ids, idf, valid

    # -- device scoring ----------------------------------------------------
    def score(
        self,
        sampled: jnp.ndarray,  # (N, L) generated token ids (beam outputs)
        ref_ids: jnp.ndarray,  # (N, R) gt token ids, -1 for OOV
        ref_idf: jnp.ndarray,  # (N, R)
        ref_valid: jnp.ndarray,  # (N, R) bool
        sigma: float = 6.0,
    ) -> jnp.ndarray:
        """CIDEr per row, matching the host scorer on these inputs."""
        N, L = sampled.shape

        # hypothesis token survival: positions strictly after the first eos
        # are dropped, and special tokens are dropped anywhere
        # (vocab.decode_caption semantics)
        after_eos = (
            jnp.cumsum(sampled == self.eos_idx, axis=1)
            - (sampled == self.eos_idx)
        ) > 0
        keep = (~after_eos) & (~self.special_mask[sampled])

        # unigram term frequencies over the vocab
        onehot = jax.nn.one_hot(sampled, self.V, dtype=jnp.float32)
        onehot = onehot * keep[..., None]
        tf = onehot.sum(axis=1)  # (N, V)

        # hypothesis vector norm over unigrams: ||tf * idf||
        hyp_vec = tf * self.idf[None, :]
        norm_hyp = jnp.sqrt(jnp.sum(hyp_vec**2, axis=1))  # (N,)

        # bigram count of the hypothesis = max(len - 1, 0) over kept tokens
        # (consecutive kept positions form the joined caption)
        hyp_len = keep.sum(axis=1)
        big_hyp = jnp.maximum(hyp_len - 1, 0).astype(jnp.float32)

        # per-reference-token similarity:
        #   ref vec = {token: 1 * idf}; clipped sim = min(hyp_vec, idf)*idf
        #   normalised by norm_hyp * idf, zero when either norm is zero
        tf_at_ref = jnp.where(
            ref_ids >= 0,
            jnp.take_along_axis(
                tf, jnp.maximum(ref_ids, 0), axis=1
            ),
            0.0,
        )  # (N, R) hyp tf of each ref token
        hyp_val = tf_at_ref * ref_idf  # hyp vector entry at the ref token
        val = jnp.minimum(hyp_val, ref_idf) * ref_idf
        denom = norm_hyp[:, None] * ref_idf
        val = jnp.where(denom > 0, val / denom, 0.0)

        # Gaussian length penalty: delta = bigram(hyp) - bigram(ref=1 word)=0
        gauss = jnp.exp(-(big_hyp**2) / (2 * sigma**2))
        val = val * gauss[:, None]

        # orders 2..4 contribute zero; mean over 4 orders, / n_refs, * 10
        n_refs = jnp.maximum(ref_valid.sum(axis=1), 1)
        score = (val * ref_valid).sum(axis=1) / 4.0 / n_refs * 10.0
        return score


class DeviceCiderFull:
    """Full n-gram (1..4) device CIDEr matching the trainer's SCST reward.

    In the trainer, ground truths are caption *strings* (full n-grams) while
    the doc-frequency corpus is the degenerate token-list one, so only
    unigrams carry df > 0; every n>=2 gram has idf = log(N).  N-gram
    matching runs via window-equality matrices (L and R are tiny), with
    clipped-count cosine per order and the Gaussian length penalty over
    bigram counts — exactly cider_scorer.py's math on these inputs.

    Host-side per-batch prep (`encode_refs`) maps reference tokens to ids:
    vocab ids where possible, unique per-image negative ids for OOV tokens
    (they match each other inside the image's references, never a
    generated token).
    """

    def __init__(self, vocab, train_captions):
        base = DeviceCider(vocab, train_captions)
        self.vocab = vocab
        self.idf = base.idf
        self.ref_len = base.ref_len
        self._df_str = base._df_str
        self.special_mask = base.special_mask
        self.eos_idx = base.eos_idx
        self.V = base.V

    def encode_refs(self, captions_per_image, n_ref_max: int, r_max: int):
        """captions_per_image: list (B) of list of caption strings."""
        B = len(captions_per_image)
        ids = np.zeros((B, n_ref_max, r_max), np.int32)
        idf = np.zeros((B, n_ref_max, r_max), np.float32)
        tok_valid = np.zeros((B, n_ref_max, r_max), bool)
        ref_valid = np.zeros((B, n_ref_max), bool)
        for b, captions in enumerate(captions_per_image):
            oov: Dict[str, int] = {}
            for r, caption in enumerate(captions[:n_ref_max]):
                ref_valid[b, r] = True
                tokens = caption.split() if isinstance(caption, str) else list(caption)
                for j, token in enumerate(tokens[:r_max]):
                    token_id = self.vocab.stoi.get(token)
                    if token_id is None:
                        if token not in oov:
                            oov[token] = -2 - len(oov)
                        token_id = oov[token]
                    ids[b, r, j] = token_id
                    df = self._df_str.get(token, 0.0)
                    idf[b, r, j] = self.ref_len - np.log(max(1.0, df))
                    tok_valid[b, r, j] = True
        return ids, idf, tok_valid, ref_valid

    @staticmethod
    def _windows_match(a_ids, a_valid, b_ids, b_valid, n):
        """(…, La) vs (…, Lb) token arrays -> (…, La-n+1, Lb-n+1) bool of
        equal n-windows (invalid windows excluded)."""
        La = a_ids.shape[-1]
        Lb = b_ids.shape[-1]
        eq = jnp.ones(a_ids.shape[:-1] + (La - n + 1, Lb - n + 1), bool)
        av = jnp.ones(a_ids.shape[:-1] + (La - n + 1,), bool)
        bv = jnp.ones(b_ids.shape[:-1] + (Lb - n + 1,), bool)
        for off in range(n):
            eq = eq & (
                a_ids[..., off : off + La - n + 1, None]
                == b_ids[..., None, off : off + Lb - n + 1]
            )
            av = av & a_valid[..., off : off + La - n + 1]
            bv = bv & b_valid[..., off : off + Lb - n + 1]
        return eq & av[..., :, None] & bv[..., None, :], av, bv

    def score(self, sampled, ref_ids, ref_idf, ref_tok_valid, ref_valid,
              beam_size: int, sigma: float = 6.0):
        """sampled: (B*beam, L); ref arrays per image (B, n_ref, R).

        Returns (B*beam,) rewards."""
        N, L = sampled.shape
        B = ref_ids.shape[0]
        n_ref, R = ref_ids.shape[1], ref_ids.shape[2]

        # hypothesis: drop specials + stop at eos, then COMPACT (n-grams of
        # the decoded string span across dropped specials)
        after_eos = (
            jnp.cumsum(sampled == self.eos_idx, axis=1)
            - (sampled == self.eos_idx)
        ) > 0
        keep = (~after_eos) & (~self.special_mask[sampled])
        order = jnp.argsort(~keep, axis=1, stable=True)
        hyp_ids = jnp.take_along_axis(sampled, order, axis=1)
        hyp_valid = jnp.take_along_axis(keep, order, axis=1)
        # invalid tail gets a sentinel that matches nothing
        hyp_ids = jnp.where(hyp_valid, hyp_ids, self.V + 7)

        # expand refs to the beam dimension
        rep = lambda x: jnp.repeat(x, beam_size, axis=0)
        ref_ids_b = rep(ref_ids)
        ref_idf_b = rep(ref_idf)
        ref_tv_b = rep(ref_tok_valid)
        ref_v_b = rep(ref_valid)

        hyp_len = hyp_valid.sum(axis=1)
        total = jnp.zeros((N,), jnp.float32)

        for n in range(1, 5):
            # hyp-hyp counts
            hh, hv, _ = self._windows_match(hyp_ids, hyp_valid, hyp_ids, hyp_valid, n)
            h_cnt = hh.sum(axis=-1).astype(jnp.float32)  # (N, Lw)
            # per-window idf weight: unigrams use the df table, n>=2 use ref_len
            if n == 1:
                w_h = self.idf[jnp.clip(hyp_ids, 0, self.V - 1)]
                w_h = jnp.where(hyp_valid, w_h, 0.0)
            else:
                w_h = jnp.full(h_cnt.shape, self.ref_len)
            norm_h = jnp.sqrt(jnp.sum(
                jnp.where(hv, h_cnt * (w_h[..., : h_cnt.shape[-1]] ** 2), 0.0),
                axis=-1,
            ))  # sqrt(sum_j cnt_j w_j^2) == ||vec||

            # ref-ref counts within each reference
            rr, rv, _ = self._windows_match(ref_ids_b, ref_tv_b, ref_ids_b, ref_tv_b, n)
            r_cnt = rr.sum(axis=-1).astype(jnp.float32)  # (N, n_ref, Rw)
            if n == 1:
                w_r = jnp.where(ref_tv_b, ref_idf_b, 0.0)
            else:
                w_r = jnp.full(r_cnt.shape, self.ref_len)
            w_r = w_r[..., : r_cnt.shape[-1]]
            norm_r = jnp.sqrt(jnp.sum(jnp.where(rv, r_cnt * w_r**2, 0.0), axis=-1))

            # hyp count at each ref window
            hr, _, rv2 = self._windows_match(
                hyp_ids[:, None, :], hyp_valid[:, None, :], ref_ids_b, ref_tv_b, n
            )  # (N, n_ref, Lw, Rw)
            h_at_r = hr.sum(axis=-2).astype(jnp.float32)  # (N, n_ref, Rw)

            # sum over ref windows of min(h, r) * w^2  (== clipped cosine numerator)
            num = jnp.sum(
                jnp.where(rv, jnp.minimum(h_at_r, r_cnt) * w_r**2, 0.0), axis=-1
            )
            denom = norm_h[:, None] * norm_r
            val = jnp.where(denom > 0, num / denom, 0.0)  # (N, n_ref)

            # Gaussian penalty over bigram-count delta
            big_h = jnp.maximum(hyp_len - 1, 0).astype(jnp.float32)
            ref_len_tok = ref_tv_b.sum(axis=-1)
            big_r = jnp.maximum(ref_len_tok - 1, 0).astype(jnp.float32)
            delta = big_h[:, None] - big_r
            val = val * jnp.exp(-(delta**2) / (2 * sigma**2))
            total = total + jnp.sum(jnp.where(ref_v_b, val, 0.0), axis=-1)

        n_refs = jnp.maximum(ref_v_b.sum(axis=-1), 1)
        return total / 4.0 / n_refs * 10.0
