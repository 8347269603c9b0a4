"""Jitted training / evaluation step functions.

Reference equivalents: the XE hot loop (trainers/vi_trainer.py:100-119,
``NLLLoss(ignore_index=pad)`` over log-softmax outputs,
base_trainer.py:91) and the SCST loop (vi_trainer.py:121-158).

SCST redesign for TPU: the reference backpropagates through the
beam-search graph itself; gradients only flow through the selected words'
log-probabilities, so an equivalent and much cheaper program is
(1) jitted no-grad beam sampling, (2) host-side CIDEr reward,
(3) one jitted teacher-forced *rescoring* step whose per-position
log-probs are masked to zero after each sequence's <eos> — reproducing
exactly the reference's ``log_probs`` tensor (finished steps contribute 0,
and the mean is over the full max_len, vi_trainer.py:151) — then
REINFORCE-with-baseline on those.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray, ignore_index: int):
    """Mean negative log-likelihood over non-ignored targets.

    Matches torch ``NLLLoss(ignore_index=...)`` semantics: sum over kept
    positions / count of kept positions."""
    vocab = log_probs.shape[-1]
    flat_lp = log_probs.reshape(-1, vocab)
    flat_t = targets.reshape(-1)
    keep = flat_t != ignore_index
    picked = jnp.take_along_axis(flat_lp, flat_t[:, None], axis=1)[:, 0]
    picked = jnp.where(keep, picked, 0.0)
    count = jnp.maximum(keep.sum(), 1)
    return -picked.sum() / count


def fused_nll(logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int):
    """Mean NLL straight from raw head logits — no log-softmax tensor.

    Math-identical to ``nll_loss(log_softmax(logits.astype(f32)))``: per
    kept position ``lse(logits) - logits[target]`` (both terms upcast to
    f32 before subtracting, exactly what the f32 log-softmax produces).
    The profiled unfused path spends ~0.4 ms/step on the (bs, L, |V|) f32
    upcast + relayout copy + flatten reshape at reference scale (xplane,
    PERF.md); here the (bs, L, |V|) tensor only exists in compute dtype as
    the head matmul's output and XLA fuses max/exp/sum into its consumers.
    Reference semantics: NLLLoss(ignore_index=pad) over log-softmax
    outputs (trainers/base_trainer.py:91)."""
    f32 = jnp.float32
    # stop_gradient on the max shift: its gradient contribution cancels
    # exactly, and removing it keeps the backward a single softmax fusion
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    # upcast BEFORE subtracting: bf16 - bf16 rounds to 8 mantissa bits,
    # while f32 subtraction of two bf16-representable values is exact —
    # only the latter matches the f32 log-softmax path bit-for-bit
    lse = m[..., 0].astype(f32) + jnp.log(
        jnp.sum(jnp.exp(logits.astype(f32) - m.astype(f32)), axis=-1)
    )
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    keep = targets != ignore_index
    per_pos = jnp.where(keep, lse - picked.astype(f32), 0.0)
    count = jnp.maximum(keep.sum(), 1)
    return per_pos.sum() / count


def _cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def make_xe_step(model, optimizer, label_smoothing: float = 0.0,
                 mixed_precision: bool = False, grad_accum: int = 1):
    """Returns a jitted (state, batch) -> (state, loss) XE update.

    ``mixed_precision``: forward/backward in bf16 against f32 master
    params (the cast is differentiable, so gradients arrive in f32 for the
    Adam update).

    ``grad_accum``: split the batch into this many microbatches along axis
    0 (must divide the batch size) and accumulate gradients over them with
    a ``lax.scan`` before the single optimizer update — the activation
    peak drops to one microbatch's worth, letting an effective batch far
    beyond HBM run in one logical step.  Token-weighted so the result
    equals the full-batch gradient exactly (each microbatch's mean-NLL is
    re-weighted by its non-pad token count).

    ``state`` is donated: XLA updates params/opt_state in place instead of
    allocating a second copy (callers must reassign, ``state = step(state,
    batch)`` — the trainer does)."""
    _update = _make_xe_update(
        model, optimizer, label_smoothing, mixed_precision, grad_accum
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def xe_step(state, batch):
        return _update(state, batch)

    return xe_step


def _make_xe_update(model, optimizer, label_smoothing, mixed_precision,
                    grad_accum):
    """The unjitted single-update body shared by make_xe_step and
    make_xe_multi_step."""

    def _loss_terms(params, mb, rng):
        """(sum of per-token losses, token count) for one microbatch."""
        mb_cast = _cast_floating(mb, jnp.bfloat16) if mixed_precision else mb
        if mixed_precision:
            params = _cast_floating(params, jnp.bfloat16)
        targets = mb["shifted_right_caption_tokens"]
        pad = model.vocab.padding_idx
        count = jnp.maximum((targets != pad).sum(), 1)
        if label_smoothing > 0.0:
            out = model.apply(params, mb_cast, train=True, rngs={"dropout": rng})
            mean = label_smoothing_loss(out, targets, pad, smoothing=label_smoothing)
        else:
            logits = model.apply(
                params, mb_cast, train=True, rngs={"dropout": rng},
                raw_logits=True,
            )
            mean = fused_nll(logits, targets, pad)
        return mean * count, count

    def _update(state, batch):
        rng, new_rng = jax.random.split(state["rng"])

        if grad_accum <= 1:
            def loss_fn(params):
                total, count = _loss_terms(params, batch, rng)
                return total / count

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(grad_accum, x.shape[0] // grad_accum, *x.shape[1:]),
                dict(batch),
            )
            rngs = jax.random.split(rng, grad_accum)
            grad_fn = jax.value_and_grad(_loss_terms, has_aux=True)
            zero = jax.tree.map(jnp.zeros_like, state["params"])

            def body(carry, mb_rng):
                g_acc, total_acc, count_acc = carry
                mb, r = mb_rng
                (total, count), g = grad_fn(state["params"], mb, r)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, total_acc + total, count_acc + count), None

            (g_sum, total, count), _ = jax.lax.scan(
                body,
                (zero, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
                (micro, rngs),
            )
            # grads of (mean*count) summed / total count == full-batch grad
            grads = jax.tree.map(lambda g: g / count, g_sum)
            loss = total / count

        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "rng": new_rng,
        }
        return new_state, loss

    return _update


def make_xe_multi_step(model, optimizer, label_smoothing: float = 0.0,
                       mixed_precision: bool = False):
    """Returns a jitted ``(state, (batch, ...)) -> (state, losses (k,))``
    running k sequential XE updates in ONE dispatch (k = the number of
    batch dicts passed; a new k retraces, so callers should use a fixed
    chunk size and fall back to single steps for the epoch remainder).

    Motivation (PERF.md xplane analysis): at reference scale the XE step
    is ~6 ms of device time but ~7.7 ms wall — ~1.6 ms/step goes to host
    dispatch (flattening the params/opt_state pytree per call) on this
    1-CPU host.  Batching k updates into one call pays that once per k
    steps.  The k batches are passed as a tuple of separate dicts (no
    host-side stacking copy) and the update body is unrolled.

    Numerics are identical to k calls of ``make_xe_step``'s update: same
    rng splits, same donation semantics (callers reassign state)."""
    _update = _make_xe_update(
        model, optimizer, label_smoothing, mixed_precision, grad_accum=1
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def xe_multi_step(state, batches):
        losses = []
        for b in batches:
            state, loss = _update(state, b)
            losses.append(loss)
        return state, jnp.stack(losses)

    return xe_multi_step


def make_eval_loss_step(model):
    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch)
        return nll_loss(
            out, batch["shifted_right_caption_tokens"], model.vocab.padding_idx
        )

    return eval_step


def scst_log_probs(model, params, batch, sampled, rng=None):
    """Teacher-forced log-probs of sampled captions, zeroed after <eos>.

    ``sampled``: (bs*beam, L) words emitted by beam search (step t's word at
    column t).  ``batch`` must already be expanded to bs*beam rows.  The
    decoder input at position t is the word emitted at t-1 (bos at t=0),
    matching the decode-time feeding order."""
    vocab = model.vocab
    L = vocab.max_caption_length
    n = sampled.shape[0]

    inputs = jnp.concatenate(
        [jnp.full((n, 1), vocab.bos_idx, jnp.int32), sampled[:, :-1]], axis=1
    )
    kwargs = {}
    if rng is not None:
        kwargs = {"train": True, "rngs": {"dropout": rng}}
    logits = model.apply(
        params, dict(batch, caption_tokens=inputs), raw_logits=True, **kwargs
    )
    # fused log-prob pick: logits[word] - lse(logits), never materialising
    # the (n, L, |V|) f32 log-softmax.  Upcast-BEFORE-subtract, exactly as
    # fused_nll: subtract-then-upcast rounds to the logits dtype's
    # mantissa and would silently diverge from the f32 log-softmax path
    # if the SCST forward ever runs in bf16.
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    lse = m[..., 0].astype(jnp.float32) + jnp.log(
        jnp.sum(
            jnp.exp(logits.astype(jnp.float32) - m.astype(jnp.float32)),
            axis=-1,
        )
    )
    picked = jnp.take_along_axis(logits, sampled[..., None], axis=2)[..., 0]
    picked = picked.astype(jnp.float32) - lse

    # zero out positions strictly after the first eos (the eos step itself
    # keeps its log-prob — beam_search.py:48-55 semantics)
    eos_seen_before = jnp.cumsum(sampled == vocab.eos_idx, axis=1) - (
        sampled == vocab.eos_idx
    ).astype(jnp.int32)
    alive = eos_seen_before == 0
    return picked * alive


def make_scst_grad_step(model, optimizer, beam_size: int):
    """Returns a jitted (state, batch, sampled, reward) -> (state, loss).

    ``batch`` is the *unexpanded* (bs, ...) feature batch; the beam-wise
    expansion happens on device inside the jit (a host-side repeat would
    re-copy the features every iteration).  ``state`` is donated (see
    make_xe_step)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scst_step(state, batch, sampled, reward):
        rng, new_rng = jax.random.split(state["rng"])
        bs = reward.shape[0]
        batch = {k: jnp.repeat(v, beam_size, axis=0) for k, v in batch.items()}

        def loss_fn(params):
            lp = scst_log_probs(model, params, batch, sampled, rng=rng)
            lp = lp.reshape(bs, beam_size, -1)
            reward_baseline = jnp.mean(reward, axis=-1, keepdims=True)
            # mean over the full max_len incl. zeroed tail (vi_trainer.py:151)
            loss = -jnp.mean(lp, axis=-1) * (reward - reward_baseline)
            return loss.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "rng": new_rng,
        }
        return new_state, loss

    return scst_step


def label_smoothing_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int,
    smoothing: float = 0.1,
):
    """KL-divergence label-smoothing loss.

    Equivalent of the reference's (dead) ``LabelSmoothing`` module
    (loss_utils/label_smoothing.py:4-41): the target distribution puts
    ``1 - smoothing`` on the gold token and spreads ``smoothing`` over the
    remaining vocabulary (excluding pad); ignored positions contribute 0.
    Wired here as a live option (``TRAINING.LABEL_SMOOTHING``)."""
    vocab = log_probs.shape[-1]
    flat_lp = log_probs.reshape(-1, vocab)
    flat_t = targets.reshape(-1)
    keep = flat_t != ignore_index

    confidence = 1.0 - smoothing
    fill = smoothing / (vocab - 2)  # excludes the gold token and pad
    true_dist = jnp.full_like(flat_lp, fill)
    true_dist = true_dist.at[:, ignore_index].set(0.0)
    one_hot = jax.nn.one_hot(flat_t, vocab, dtype=flat_lp.dtype)
    true_dist = jnp.where(one_hot > 0, confidence, true_dist)

    kl = true_dist * (jnp.log(jnp.clip(true_dist, min=1e-12)) - flat_lp)
    per_pos = kl.sum(-1)
    per_pos = jnp.where(keep, per_pos, 0.0)
    return per_pos.sum() / jnp.maximum(keep.sum(), 1)
