"""Batched beam search as one jitted XLA program.

Reference equivalent: models/modules/beam_search.py:4-118 — a Python loop
over decode steps with stateful-buffer gathers (``apply_to_states``) every
step.  Here the whole decode is one jitted XLA loop:

 - the KV cache is a preallocated pytree (bs*beam leading dim); beam
   reordering is one ``take_along_axis`` gather over the pytree (replaces
   the recursive ``_expand_state`` gather at beam_search.py:19-34,61);
   the never-mutated cross-attention K/V stays out of the loop carry;
 - eos semantics replicate the reference exactly, including the ``-999``
   continuation trick (beam_search.py:48-55): a finished beam's candidate
   row keeps word 0 (<pad>) at its frozen sequence log-prob and every other
   word at -999, and its per-step word log-prob contribution is zeroed;
 - the t=0 "cur_beam_size=1" special case (beam_search.py:42) is emulated
   with full static shapes by initialising every beam except 0 at a -1e18
   sequence log-prob, so the first top-k draws beam_size distinct words
   from beam 0 — identical selection, no dynamic shapes;
 - selection is a two-stage top-k (per-beam iterative argmax + tiny exact
   top-k) with the reference's flattened-argsort tie order;
 - by default a ``lax.while_loop`` exits as soon as every beam has emitted
   eos (observably identical to the reference's fixed max_len loop, whose
   tail steps are no-ops; ``early_exit=False`` restores the plain scan);
 - optional ``compute_dtype=bfloat16`` runs the network fast path while
   selection math stays f32 (PERF.md).

Encoder memory is broadcast beam-wise once at the start (the reference
reaches the same state through ``_expand_state``'s view/expand at t=0).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from openviic_tpu.models.base import make_decode_cache


def _expand_to_beams(tree, beam_size: int):
    """(bs, ...) -> (bs*beam, ...) by repeating each row beam_size times."""

    def expand(x):
        if x is None:
            return None
        return jnp.repeat(x, beam_size, axis=0)

    return jax.tree.map(expand, tree)


def _gather_beams(tree, selected_beam: jnp.ndarray, b_s: int, beam_size: int):
    """Reorder the beam dimension of every (bs*beam, ...) leaf.

    ``selected_beam``: (bs, beam) int — for each output beam slot, which
    input beam to copy (the reference's ``apply_to_states(_expand_state)``
    gather, beam_search.py:19-34)."""

    def gather(x):
        if x is None:
            return None
        shaped = x.reshape((b_s, beam_size) + x.shape[1:])
        idx = selected_beam.reshape((b_s, beam_size) + (1,) * (x.ndim - 1))
        out = jnp.take_along_axis(shaped, idx, axis=1)
        return out.reshape((b_s * beam_size,) + x.shape[1:])

    return jax.tree.map(gather, tree)


def _select_topk(candidate_logprob: jnp.ndarray, beam_size: int):
    """Top beam_size over the flattened (beam, vocab) candidates.

    Equivalent to ``top_k(candidate.reshape(bs, beam*V), beam_size)`` with
    first-lowest-index tie-breaking, but O(k) max-reductions per beam
    instead of a wide sort."""
    b_s, n_beams, vocab_size = candidate_logprob.shape

    # stage 1: top beam_size within each beam via iterative argmax
    vals = candidate_logprob
    col = jnp.arange(vocab_size)[None, None, :]
    s1_vals, s1_idx = [], []
    for _ in range(beam_size):
        j = jnp.argmax(vals, axis=-1)  # (bs, n_beams), first index on ties
        v = jnp.take_along_axis(vals, j[..., None], axis=-1)[..., 0]
        s1_vals.append(v)
        s1_idx.append(j)
        vals = jnp.where(col == j[..., None], -jnp.inf, vals)
    s1_vals = jnp.stack(s1_vals, axis=-1)  # (bs, n_beams, k) desc per beam
    s1_idx = jnp.stack(s1_idx, axis=-1)

    # stage 2: exact top-k over the beam_size*beam_size survivors
    flat_vals = s1_vals.reshape(b_s, n_beams * beam_size)
    sel_v, sel_i = jax.lax.top_k(flat_vals, beam_size)
    selected_beam = sel_i // beam_size
    selected_words = jnp.take_along_axis(
        s1_idx.reshape(b_s, n_beams * beam_size), sel_i, axis=1
    )
    return sel_v, selected_beam, selected_words


def _gather_beams_onehot(x: jnp.ndarray, selected_beam: jnp.ndarray) -> jnp.ndarray:
    """Beam-axis gather of a small (bs, beam, ...) tensor via one-hot
    contraction.  ``take_along_axis`` on these shapes lowers to a slow
    per-element gather on TPU (~90us/step each in the decode profile); the
    one-hot einsum is a vectorised VPU op.

    ``Precision.HIGHEST`` is REQUIRED for exactness: at the TPU default
    precision the MXU runs f32 operands through bf16 passes, rounding
    integer payloads above 256 to their bf16 neighbourhood (measured:
    7095 -> 7104, 4567 -> 4576) — which corrupted sampled token ids past
    the vocab bound in the round-5 realistic-vocab SCST run.  At HIGHEST
    the contraction is exact for ints < 2^24."""
    n_beams = x.shape[1]
    onehot = (
        selected_beam[..., None] == jnp.arange(n_beams, dtype=selected_beam.dtype)
    ).astype(jnp.float32)
    flat = x.reshape(x.shape[0], n_beams, -1).astype(jnp.float32)
    out = jnp.einsum(
        "bqp,bpk->bqk", onehot, flat, precision=jax.lax.Precision.HIGHEST
    )
    return out.reshape((x.shape[0], n_beams) + x.shape[2:]).astype(x.dtype)


def _select_topk_hier(
    logits: jnp.ndarray,  # (bs, beam, V) raw head outputs, f32
    offset: jnp.ndarray,  # (bs, beam) seq_logprob - logsumexp per live row
    finished: jnp.ndarray,  # (bs, beam) bool — beam already emitted eos
    seq_logprob: jnp.ndarray,  # (bs, beam)
    beam_size: int,
    tile: int = 512,
):
    """Exact top-k with one full pass over the vocab instead of ~k.

    Stage 1 (per beam): tile maxima (single read of ``logits``), then k
    iterations that touch only the winning 1-tile slice.  The -999
    finished-beam continuation (beam_search.py:48-55) never needs a vocab
    scan: its candidate set is exactly {word 0 @ seq_logprob, every other
    word @ -999}, substituted analytically.  Stage 2: exact top-k over the
    beam*k survivors.  Tie order matches the flattened argsort
    (beam-major, ascending word index), same as ``_select_topk``.

    Returns (selected_logprob, selected_beam, selected_words,
    selected_word_logit) where the last is the raw logit of each chosen
    word (callers turn it into a log-prob with the per-row lse)."""
    b_s, n_beams, V = logits.shape
    n_tiles = -(-V // tile)
    pad = n_tiles * tile - V
    if pad:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)), constant_values=-jnp.inf)
    tiles = logits.reshape(b_s, n_beams, n_tiles, tile)
    tmax = jnp.max(tiles, axis=-1)  # (bs, beam, n_tiles) — the one full pass

    col = jnp.arange(tile)[None, None, :]
    tcol = jnp.arange(n_tiles)[None, None, :]
    picked = []  # (jt, jw, val) per iteration
    for _ in range(beam_size):
        jt = jnp.argmax(tmax, axis=-1)  # (bs, beam) winning tile, first on ties
        t_sel = jnp.take_along_axis(tiles, jt[..., None, None], axis=2)[..., 0, :]
        for p_jt, p_jw, _ in picked:  # re-mask words already extracted
            t_sel = jnp.where(
                jnp.logical_and((jt == p_jt)[..., None], col == p_jw[..., None]),
                -jnp.inf,
                t_sel,
            )
        jw = jnp.argmax(t_sel, axis=-1)  # (bs, beam)
        val = jnp.take_along_axis(t_sel, jw[..., None], axis=-1)[..., 0]
        picked.append((jt, jw, val))
        # refresh the winning tile's max with the chosen word removed
        t_rem = jnp.where(col == jw[..., None], -jnp.inf, t_sel)
        tmax = jnp.where(
            tcol == jt[..., None], jnp.max(t_rem, axis=-1)[..., None], tmax
        )

    s1_words = jnp.stack([jt * tile + jw for jt, jw, _ in picked], axis=-1)
    s1_logit = jnp.stack([v for _, _, v in picked], axis=-1)  # raw logits
    return _finish_select(
        s1_logit, s1_words, offset, finished, seq_logprob, beam_size
    )


def _finish_select(s1_logit, s1_words, offset, finished, seq_logprob, beam_size):
    """Finished-beam substitution + stage-2 top-k over per-beam stage-1
    candidates (s1_logit/s1_words: (bs, beam, k) raw logits + word ids)."""
    b_s, n_beams = s1_logit.shape[:2]
    s1_vals = s1_logit + offset[..., None]

    # finished beams: candidate 0 is word 0 at the frozen seq log-prob,
    # every other word sits at exactly -999 (the reference's continuation
    # trick) — no scan needed
    first = seq_logprob >= -999.0
    fin_vals = jnp.where(
        first[..., None],
        jnp.concatenate(
            [seq_logprob[..., None], jnp.full_like(s1_vals[..., 1:], -999.0)], -1
        ),
        jnp.full_like(s1_vals, -999.0),
    )
    fin_words = jnp.where(
        first[..., None],
        jnp.arange(beam_size)[None, None, :],
        jnp.arange(1, beam_size + 1)[None, None, :],
    )
    s1_vals = jnp.where(finished[..., None], fin_vals, s1_vals)
    s1_words = jnp.where(finished[..., None], fin_words, s1_words)
    s1_logit = jnp.where(finished[..., None], 0.0, s1_logit)

    # stage 2: exact top-k over beam*k survivors (beam-major tie order)
    flat_vals = s1_vals.reshape(b_s, n_beams * beam_size)
    sel_v, sel_i = jax.lax.top_k(flat_vals, beam_size)
    selected_beam = sel_i // beam_size
    selected_words = jnp.take_along_axis(
        s1_words.reshape(b_s, n_beams * beam_size), sel_i, axis=1
    )
    selected_logit = jnp.take_along_axis(
        s1_logit.reshape(b_s, n_beams * beam_size), sel_i, axis=1
    )
    return sel_v, selected_beam, selected_words, selected_logit


def _supports_beam_resident(model) -> bool:
    """Beam-resident decode needs the plain SDPA attention kernels (which
    carry ``attend_projected_beam_select`` / ``attend_cached_grouped``) in
    every decoder layer; other kernels (adaptive language-signal, etc.)
    fall back to the default path."""
    try:
        dec = model.config.DECODER
        if dec.ARCHITECTURE not in ("Decoder", "MeshedDecoder"):
            return False
        att = dec.ATTENTION
        return (
            att.SELF_ATTENTION.ARCHITECTURE == "ScaledDotProductAttention"
            and att.ENC_ATTENTION.ARCHITECTURE == "ScaledDotProductAttention"
        )
    except Exception:
        return False


def _split_cache(cache):
    """Separate the per-step-mutable part (self KV + pad) from the static
    cross-attention KV (and the optional precomputed language-signal
    table), so the scan carry (gathered every step) stays small."""
    static = {
        "layers": [{"cross": lc["cross"]} for lc in cache["layers"]],
        "language_table": cache.get("language_table"),
    }
    dynamic = {
        "layers": [{"self": lc["self"]} for lc in cache["layers"]],
        "pad": cache["pad"],
    }
    return static, dynamic


def _merge_cache(static, dynamic):
    layers = [
        {"self": d["self"], "cross": s["cross"]}
        for s, d in zip(static["layers"], dynamic["layers"])
    ]
    merged = {"layers": layers, "pad": dynamic["pad"]}
    if static.get("language_table") is not None:
        merged["language_table"] = static["language_table"]
    return merged


def beam_search(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    beam_size: int,
    out_size: int = 1,
    train_dropout_rng: Optional[jax.Array] = None,
    early_exit: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    return_probs: bool = False,
    lazy_reorder: bool = False,
    beam_resident: bool = False,
    fast_select: Optional[bool] = None,
    resident_kernel: bool = False,
    unroll: Union[bool, int] = False,
    head_kernel: Union[bool, int] = False,
    attn_kernel: bool = False,
    language_table: Optional[jnp.ndarray] = None,
    _return_stream: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run batched beam search; returns (outputs, log_probs).

    ``language_table``: optional precomputed (vocab, d) language-signal
    table for AdaptiveDecoder models (RSTNet) — replaces the per-step
    frozen-LM forward with a gather, exact because the step LM sees only
    the current token (models/decoders.py AdaptiveDecoder.step).  Compute
    once per checkpoint via ``model.compute_language_table``.

    outputs: (bs, out_size, max_len) int32 (squeezed to (bs, max_len) when
    out_size == 1), log_probs likewise — matching the reference's return
    convention (beam_search.py:109-118).

    ``train_dropout_rng``: when given, the encoder and every decode step
    run with dropout ACTIVE (per-step rng = fold_in(rng, t)) — the
    reference's SCST sampling mode, where ``beam_search`` executes under
    ``model.train()`` (vi_trainer.py:126-132).  Enabled from the trainer
    via ``TRAINING.SCST_SAMPLE_DROPOUT``.  The fused step kernels bypass
    themselves in this mode (they do not implement dropout)."""
    vocab = model.vocab
    max_len = vocab.max_caption_length
    eos_idx = vocab.eos_idx
    bos_idx = vocab.bos_idx

    if compute_dtype is not None:
        # fast-decode mode: run the network in bf16 (selection math stays
        # f32).  Parity mode (compute_dtype=None) keeps everything f32.
        params = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
        batch = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            batch,
        )

    if resident_kernel or head_kernel or attn_kernel:
        # the fused Pallas kernels implement the beam-resident math
        beam_resident = True
    if beam_resident and not _supports_beam_resident(model):
        # decoders whose attention kernels lack the beam-select methods
        # (adaptive language-signal attention, etc.) use the default path
        beam_resident = resident_kernel = head_kernel = False
        attn_kernel = False
        fast_select = False if fast_select is None else fast_select
    if beam_resident:
        # beam-resident mode: the KV caches are never reordered (ancestry
        # one-hot selection inside the attention) and the cross-attention
        # K/V + mask stay at image granularity — cache traffic drops by
        # the gather rewrite and the beam factor respectively
        lazy_reorder = True
    if fast_select is None:
        fast_select = beam_resident
    if return_probs:
        # the full per-step distributions are requested — the fused
        # selection paths (lse top-k and the head+top-k kernel) never
        # materialise them
        fast_select = False
        head_kernel = False

    # 1) encode once at batch size, then broadcast to beams
    enc_kwargs = {}
    if train_dropout_rng is not None:
        # dropout-active sampling: the encoder gets its own rng stream
        # (fold index max_len never collides with a step index)
        enc_kwargs = dict(
            train=True,
            rngs={"dropout": jax.random.fold_in(train_dropout_rng, max_len)},
        )
    memory, memory_mask = model.apply(
        params, batch, method=model.encoder_forward, **enc_kwargs
    )
    b_s = jax.tree.leaves(memory)[0].shape[0]

    if not beam_resident:
        memory = _expand_to_beams(memory, beam_size)
        memory_mask = _expand_to_beams(memory_mask, beam_size)

    # 2) build + prepare the decode cache at bs*beam; the cross-attention
    # K/V is identical across beams and never mutated — keep it out of the
    # scan carry so it is not gathered every step.
    cache = make_decode_cache(model.config.DECODER, vocab, b_s * beam_size)
    if compute_dtype is not None:
        cache = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            cache,
        )
    cache = model.apply(params, cache, memory, method=model.prepare_cache)
    if language_table is not None:
        table = jnp.asarray(language_table)
        if compute_dtype is not None and jnp.issubdtype(
            table.dtype, jnp.floating
        ):
            table = table.astype(compute_dtype)
        cache["language_table"] = table
    static_cache, dynamic_cache = _split_cache(cache)

    vocab_size = len(vocab)

    # 3) scan over decode steps
    seq_logprob0 = jnp.full((b_s, beam_size, 1), -1e18)
    seq_logprob0 = seq_logprob0.at[:, 0, :].set(0.0)

    init = {
        "cache": dynamic_cache,
        "seq_logprob": seq_logprob0,
        "seq_mask": jnp.ones((b_s, beam_size, 1)),
        "selected_words": jnp.full((b_s * beam_size, 1), bos_idx, dtype=jnp.int32),
        "outputs": jnp.zeros((b_s, beam_size, max_len), dtype=jnp.int32),
        "log_probs": jnp.zeros((b_s, beam_size, max_len)),
    }
    if return_probs:
        # per-step full distributions (reference beam_search.py:68-72: the
        # eos-masked word log-probs per step, NOT re-gathered on later beam
        # reorders — only sorted at the end)
        init["all_log_probs"] = jnp.zeros((b_s, beam_size, max_len, vocab_size))
    if lazy_reorder:
        # ancestry table: the KV caches are never physically reordered;
        # ancestry[b, j, t'] is the beam slot holding position t' of beam
        # j's prefix, resolved at attention-read time (attention.py
        # _resolve_ancestry).  Beam selection then gathers this tiny int
        # table instead of the multi-MB caches.
        init["ancestry"] = jnp.zeros((b_s, beam_size, max_len), jnp.int32)

    def step_fn(carry, t):
        ancestry = None
        if lazy_reorder:
            # position t of every current beam lives at its own slot
            ancestry = jax.lax.dynamic_update_slice_in_dim(
                carry["ancestry"],
                jnp.broadcast_to(
                    jnp.arange(beam_size, dtype=jnp.int32)[None, :, None],
                    (b_s, beam_size, 1),
                ),
                t,
                axis=2,
            )
        step_kwargs = {}
        if train_dropout_rng is not None:
            step_kwargs = dict(
                train=True,
                rngs={"dropout": jax.random.fold_in(train_dropout_rng, t)},
            )
        head, new_cache = model.apply(
            params,
            t,
            carry["selected_words"],
            _merge_cache(static_cache, carry["cache"]),
            memory_mask,
            ancestry,
            beam_size if beam_resident else None,
            "hidden" if head_kernel else fast_select,
            resident_kernel,
            attn_kernel,
            method=model.decode_step,
            **step_kwargs,
        )
        _, new_cache = _split_cache(new_cache)
        seq_logprob = carry["seq_logprob"]
        prev_words = carry["selected_words"].reshape(b_s, beam_size)
        not_eos = (prev_words != eos_idx).astype(seq_logprob.dtype)[..., None]
        seq_mask_t = jnp.where(t > 0, carry["seq_mask"] * not_eos, carry["seq_mask"])

        if head_kernel:
            # fused vocab head + lse + per-row exact top-k in one kernel
            # (ops/head_topk.py); the finished-beam substitution + stage-2
            # top-k stay in XLA ((bs, beam)-sized math)
            from openviic_tpu.ops.head_topk import head_topk

            fc_kernel = params["params"]["decoder"]["fc"]["kernel"]
            # head_kernel > 1 selects the row-blocked grid variant with
            # that block size (weights VMEM-resident across grid steps) —
            # lifts the single-block VMEM ceiling at very large batches
            block = int(head_kernel) if int(head_kernel) > 1 else None
            vals, idxs, lse_rows = head_topk(
                head, fc_kernel, k=beam_size, block_rows=block
            )
            s1_logit = vals.reshape(b_s, beam_size, beam_size)
            s1_words = idxs.reshape(b_s, beam_size, beam_size)
            lse = lse_rows.reshape(b_s, beam_size)
            seq_lp = seq_logprob[..., 0]
            finished = jnp.logical_and(t > 0, seq_mask_t[..., 0] == 0.0)
            offset = seq_lp - lse
            (
                selected_logprob, selected_beam, selected_words, selected_logit,
            ) = _finish_select(
                s1_logit, s1_words, offset, finished, seq_lp, beam_size
            )
            lse_sel = _gather_beams_onehot(lse, selected_beam)
            fin_sel = _gather_beams_onehot(finished, selected_beam)
            this_word_logprob = jnp.where(
                fin_sel, 0.0, selected_logit - lse_sel
            )
        elif fast_select:
            # One full-vocab pass total: the decoder returned raw logits +
            # per-row logsumexp; candidate = (seq_lp - lse) + logit folds
            # log-softmax into the per-row offset, the -999 finished-beam
            # candidates are substituted analytically, and the hierarchical
            # top-k reads the logits once.
            logits, lse = head
            logits = logits.reshape(b_s, beam_size, vocab_size)
            lse = lse.reshape(b_s, beam_size)
            seq_lp = seq_logprob[..., 0]
            finished = jnp.logical_and(t > 0, seq_mask_t[..., 0] == 0.0)
            offset = seq_lp - lse
            (
                selected_logprob, selected_beam, selected_words, selected_logit,
            ) = _select_topk_hier(logits, offset, finished, seq_lp, beam_size)
            lse_sel = _gather_beams_onehot(lse, selected_beam)
            fin_sel = _gather_beams_onehot(finished, selected_beam)
            this_word_logprob = jnp.where(
                fin_sel, 0.0, selected_logit - lse_sel
            )
        else:
            word_logprob = head.astype(jnp.float32).reshape(
                b_s, beam_size, vocab_size
            )
            candidate_logprob = seq_logprob + word_logprob

            # --- eos masking (active for t > 0; beam_search.py:48-55) ---
            word_logprob_eff = jnp.where(
                t > 0, word_logprob * seq_mask_t, word_logprob
            )
            old_seq_logprob = jnp.where(
                jnp.arange(vocab_size)[None, None, :] >= 1, -999.0, seq_logprob
            )
            candidate_logprob = jnp.where(
                t > 0,
                seq_mask_t * candidate_logprob + old_seq_logprob * (1.0 - seq_mask_t),
                candidate_logprob,
            )

            # --- select top beam_size over (beam*vocab) -----------------
            # Two-stage selection: per-beam top-k via iterative argmax (k
            # max reductions beat a sort-based top_k over beam*V on TPU —
            # measured ~13ms -> ~1ms at V=10k), then an exact top-k over
            # the beam*k survivors.  Tie-breaking matches the flattened
            # argsort order (beam-major, then ascending word index).
            selected_logprob, selected_beam, selected_words = _select_topk(
                candidate_logprob, beam_size
            )
            this_word_logprob = jnp.take_along_axis(
                word_logprob_eff, selected_beam[..., None], axis=1
            )
            this_word_logprob = jnp.take_along_axis(
                this_word_logprob, selected_words[..., None], axis=2
            )[..., 0]  # (bs, beam)

        # --- reorder all state by selected_beam -------------------------
        small_gather = _gather_beams_onehot if fast_select else (
            lambda x, sb: jnp.take_along_axis(
                x, sb.reshape(sb.shape + (1,) * (x.ndim - 2)), axis=1
            )
        )
        if lazy_reorder:
            # only the ancestry table is gathered; the caches stay put
            new_ancestry = small_gather(ancestry, selected_beam)
        else:
            new_cache = _gather_beams(new_cache, selected_beam, b_s, beam_size)
        seq_mask_t = small_gather(seq_mask_t, selected_beam)
        outputs = small_gather(carry["outputs"], selected_beam)
        outputs = outputs.at[:, :, t].set(selected_words)

        log_probs = small_gather(carry["log_probs"], selected_beam)
        log_probs = log_probs.at[:, :, t].set(this_word_logprob)

        if return_probs:
            carry["all_log_probs"] = carry["all_log_probs"].at[:, :, t].set(
                word_logprob_eff
            )

        new_carry = {
            "cache": new_cache,
            "seq_logprob": selected_logprob[..., None],
            "seq_mask": seq_mask_t,
            "selected_words": selected_words.reshape(b_s * beam_size, 1).astype(
                jnp.int32
            ),
            "outputs": outputs,
            "log_probs": log_probs,
        }
        if lazy_reorder:
            new_carry["ancestry"] = new_ancestry
        if return_probs:
            new_carry["all_log_probs"] = carry["all_log_probs"]
        return new_carry, None

    def finalize(final):
        # sort beams by final sequence log-prob (beam_search.py:97-107)
        seq_logprob = final["seq_logprob"][..., 0]  # (bs, beam)
        sort_idxs = jnp.argsort(-seq_logprob, axis=1)
        outputs = jnp.take_along_axis(
            final["outputs"], sort_idxs[..., None], axis=1
        )
        log_probs = jnp.take_along_axis(
            final["log_probs"], sort_idxs[..., None], axis=1
        )

        outputs = outputs[:, :out_size]
        log_probs = log_probs[:, :out_size]
        if out_size == 1:
            outputs = outputs[:, 0]
            log_probs = log_probs[:, 0]
        if return_probs:
            all_log_probs = jnp.take_along_axis(
                final["all_log_probs"], sort_idxs[..., None, None], axis=1
            )
            return outputs, log_probs, all_log_probs
        return outputs, log_probs

    if _return_stream:
        # expose (init, step_fn, finalize) so beam_search_multi can fuse
        # several independent streams into one while_loop
        return init, step_fn, finalize

    if unroll is True:
        # fully-unrolled decode: every step has a *static* t, so XLA can
        # hoist the per-iteration weight staging out of the loop (a
        # while-loop body re-prefetches every loop-invariant buffer each
        # iteration — the dominant cost in the decode profile) and
        # software-pipeline across steps.  No early exit (the reference's
        # fixed max_len loop, beam_search.py:94-95).
        carry = init
        for t in range(max_len):
            carry, _ = step_fn(carry, t)
        final = carry
    elif isinstance(unroll, int) and unroll > 1 and early_exit:
        # partially-unrolled while_loop: the body runs ``unroll``
        # consecutive steps, so the per-iteration staging of loop-invariant
        # weight buffers (the decode profile's dominant fixed cost) is paid
        # once per ``unroll`` steps and XLA can software-pipeline across
        # the fused steps.  Early exit coarsens to ``unroll``-step
        # granularity — at most unroll-1 extra no-op steps, which change no
        # observable output (same argument as the early-exit variant
        # below), so results stay identical to the reference's fixed
        # max_len loop.
        k = int(unroll)
        main_stop = (max_len // k) * k

        def cond_k(state):
            t, carry = state
            any_alive = jnp.any(carry["seq_mask"] > 0)
            return jnp.logical_and(
                t < main_stop, jnp.logical_or(any_alive, t < 2)
            )

        def body_k(state):
            t, carry = state
            for i in range(k):
                carry, _ = step_fn(carry, t + i)
            return (t + k, carry)

        t_end, final = jax.lax.while_loop(
            cond_k, body_k, (jnp.asarray(0), init)
        )
        if max_len % k:
            # remainder steps (single-step body, same early-exit guard)
            def cond_1(state):
                t, carry = state
                any_alive = jnp.any(carry["seq_mask"] > 0)
                return jnp.logical_and(
                    t < max_len, jnp.logical_or(any_alive, t < 2)
                )

            def body_1(state):
                t, carry = state
                new_carry, _ = step_fn(carry, t)
                return (t + 1, new_carry)

            _, final = jax.lax.while_loop(cond_1, body_1, (t_end, final))
    elif early_exit:
        # while_loop variant: stop once every beam of every image has
        # emitted <eos>.  Finished-state steps are no-ops on all observable
        # outputs (finished beams keep word 0 at their frozen log-prob and
        # contribute zero per-step log-probs), so results are identical to
        # the reference's fixed max_len loop — just without the dead tail.
        def cond_fn(state):
            t, carry = state
            any_alive = jnp.any(carry["seq_mask"] > 0)
            return jnp.logical_and(t < max_len, jnp.logical_or(any_alive, t < 2))

        def body_fn(state):
            t, carry = state
            new_carry, _ = step_fn(carry, t)
            return (t + 1, new_carry)

        _, final = jax.lax.while_loop(cond_fn, body_fn, (jnp.asarray(0), init))
    else:
        final, _ = jax.lax.scan(step_fn, init, jnp.arange(max_len))

    return finalize(final)


def beam_search_multi(
    model,
    params,
    batches,
    beam_size: int,
    out_size: int = 1,
    compute_dtype: Optional[jnp.dtype] = None,
    beam_resident: bool = True,
):
    """Decode several independent batches inside ONE jitted program.

    The streams share a single ``lax.while_loop`` whose body runs every
    stream's decode step; the streams have no data dependencies on each
    other, so XLA's latency-hiding scheduler can interleave their op
    graphs — one stream's DMA/fusion bubbles are filled with another
    stream's compute.  This targets the per-op-overhead-bound decode tail
    (PERF.md "Remaining gap analysis": ~540 us/step vs ~120 us HBM floor
    at batch 64) that batch scaling alone does not amortise.

    Token-identical to ``beam_search`` run per batch (same step_fn), cf.
    tests/test_beam_search_variants.py.  Reference mechanics being beaten:
    models/modules/beam_search.py:94-118 (one python loop per batch).

    Returns a list of (outputs, log_probs), one per input batch.
    """
    streams = [
        beam_search(
            model,
            params,
            b,
            beam_size=beam_size,
            out_size=out_size,
            compute_dtype=compute_dtype,
            beam_resident=beam_resident,
            _return_stream=True,
        )
        for b in batches
    ]
    inits = tuple(s[0] for s in streams)
    max_len = model.vocab.max_caption_length

    def cond_fn(state):
        t, carries = state
        alive = jnp.any(
            jnp.stack([jnp.any(c["seq_mask"] > 0) for c in carries])
        )
        return jnp.logical_and(t < max_len, jnp.logical_or(alive, t < 2))

    def body_fn(state):
        t, carries = state
        new = tuple(
            streams[i][1](carries[i], t)[0] for i in range(len(streams))
        )
        return (t + 1, new)

    _, finals = jax.lax.while_loop(cond_fn, body_fn, (jnp.asarray(0), inits))
    return [streams[i][2](finals[i]) for i in range(len(streams))]


def _batch_spans_devices(batch) -> bool:
    """True when any batch leaf lives on more than one device (a
    dp-mesh-sharded eval/SCST decode batch, trainer._decode_loader).

    The Pallas kernels are Mosaic custom calls with no SPMD partitioning
    rule — jitting them over sharded operands fails to compile on real
    multi-chip meshes (the CPU-mesh tests don't see it because interpret
    mode lowers to plain partitionable jax ops), so the kernel paths must
    fall back to the XLA fast path for those calls."""
    for leaf in jax.tree.leaves(batch):
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None:
            try:
                if len(sharding.device_set) > 1:
                    return True
            except (AttributeError, TypeError):
                pass
    return False


def _head_kernel_wins(b_s: int, beam_size: int) -> bool:
    """Measured win region of the fused head+top-k kernel (PERF.md round 3,
    2026-08-19): beam 5 wins from 480 rows (bs96 +12%, bs320 +20%); beam 3
    needs ~960 rows (bs64/192 rows -18%, bs320/960 rows +16%); beam 1
    (greedy, k=1) never won up to 512 rows (-2%..-31%).  Below the
    boundary the kernel's per-grid-step overhead outweighs its fusion win
    and the XLA fast-select path is faster."""
    rows = b_s * beam_size
    if beam_size >= 5:
        return rows >= 480
    if beam_size > 1:
        return rows >= 960
    return False


class BeamSearcher:
    """Caches jit-compiled beam search callables per (beam, out_size)."""

    def __init__(self, model, compute_dtype=None, beam_resident=True,
                 head_kernel=False, attn_kernel=False):
        self.model = model
        self.compute_dtype = compute_dtype
        # beam-resident decode is token-identical to the default path and
        # ~2x faster (PERF.md round 2) — on by default for trainer decode
        self.beam_resident = beam_resident
        # fused head+top-k Pallas kernel (ops/head_topk.py): +14-20%
        # measured on-chip (PERF.md round 3).  Token-identical in exact
        # arithmetic; its f32 accumulation splits the vocab reduction
        # differently from XLA's, so bf16 near-ties can resolve
        # differently (trained-checkpoint decode measured 100%
        # token-identical).  Off by default for strict parity runs;
        # enable via TRAINING.DECODE_HEAD_KERNEL.
        #
        # head_kernel=True is an AUTO gate, not a force: the kernel is
        # used only inside its measured win region (_head_kernel_wins);
        # smaller calls keep the XLA fast path.  An int value (the
        # row-blocked variant) forces it unconditionally.
        self.head_kernel = head_kernel
        # fused beam-select self-attention step kernel
        # (ops/beam_select_attention.py); same numeric class as
        # head_kernel.  Enable via TRAINING.DECODE_ATTN_KERNEL.
        self.attn_kernel = attn_kernel
        self._compiled: Dict[Tuple[int, int], Any] = {}

    def _effective_head_kernel(self, batch, beam_size: int):
        """Resolve head_kernel=True per call: use the kernel only when
        bs*beam reaches the measured win region (see __init__ comment)."""
        if self.head_kernel is True:
            b_s = jax.tree.leaves(batch)[0].shape[0]
            return _head_kernel_wins(b_s, beam_size)
        return self.head_kernel

    def __call__(self, params, batch, beam_size: int, out_size: int = 1,
                 dropout_rng: Optional[jax.Array] = None,
                 language_table: Optional[jax.Array] = None):
        """``dropout_rng``: sample with dropout active (a traced argument —
        a fresh rng per call re-uses the compiled program).
        ``language_table``: precomputed (vocab, d) signal table for
        AdaptiveDecoder models (also a traced operand)."""
        head_kernel = self._effective_head_kernel(batch, beam_size)
        attn_kernel = self.attn_kernel
        if (head_kernel or attn_kernel) and _batch_spans_devices(batch):
            # Mosaic custom calls cannot be auto-partitioned over a
            # sharded batch (see _batch_spans_devices) — XLA fast path
            head_kernel = attn_kernel = False
        key = (
            beam_size, out_size, dropout_rng is not None,
            head_kernel, attn_kernel, language_table is not None,
        )
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                functools.partial(
                    beam_search,
                    self.model,
                    beam_size=beam_size,
                    out_size=out_size,
                    compute_dtype=self.compute_dtype,
                    beam_resident=self.beam_resident,
                    head_kernel=head_kernel,
                    attn_kernel=attn_kernel,
                )
            )
        kwargs = {}
        if dropout_rng is not None:
            kwargs["train_dropout_rng"] = dropout_rng
        if language_table is not None:
            kwargs["language_table"] = language_table
        return self._compiled[key](params, batch=batch, **kwargs)
