"""Optimizer + LR schedule.

Reference equivalent: Adam(betas=0.9/0.98) with a Noam-style LambdaLR
stepped per iteration (trainers/base_trainer.py:89-90,114-117):
``lr = base_lr * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)``
with step starting at 1.
"""

from __future__ import annotations

import optax


def noam_schedule(d_model: int, warmup: int, base_lr: float = 1.0):
    import jax.numpy as jnp

    def schedule(count):
        # reference lambda does step += 1 (base_trainer.py:115)
        step = count + 1.0
        return base_lr * (d_model**-0.5) * jnp.minimum(
            step**-0.5, step * warmup**-1.5
        )

    return schedule


def make_optimizer(d_model: int, warmup: int, base_lr: float = 1.0):
    """Adam with the Noam schedule (XE phase)."""
    return optax.adam(
        learning_rate=noam_schedule(d_model, warmup, base_lr), b1=0.9, b2=0.98
    )


def fast_forward_schedule(opt_state, step: int):
    """Fresh optimizer state with its LR schedule resumed at ``step``.

    Used when continuing training from a migrated reference checkpoint
    that carries no optimizer payload (e.g. ``best_model.pth``): the Adam
    moments legitimately restart from zero (count 0 keeps their bias
    correction consistent), but the Noam schedule must NOT restart its
    warmup — ``optax.scale_by_schedule`` drives the LR off its internal
    ``ScaleByScheduleState.count``, not off the trainer's saved step, so
    that count is fast-forwarded here."""
    import jax

    sched = optax.ScaleByScheduleState

    def repl(node):
        if isinstance(node, sched):
            import jax.numpy as jnp

            return sched(count=jnp.asarray(step, dtype=node.count.dtype))
        return node

    return jax.tree_util.tree_map(
        repl, opt_state, is_leaf=lambda x: isinstance(x, sched)
    )


def make_rl_optimizer(rl_learning_rate: float):
    """Fresh Adam at a fixed LR for the SCST phase (vi_trainer.py:204)."""
    return optax.adam(learning_rate=rl_learning_rate, b1=0.9, b2=0.999)


def frozen_param_mask(params):
    """True for trainable leaves, False for frozen ones.

    The only frozen subtree in the model zoo is the pretrained
    language-model backbone (reference language_models.py:19-21 sets
    ``requires_grad=False``; here the forward wraps it in
    ``stop_gradient``, models/language_models.py).  Its gradients are
    structurally zero, so Adam moments for it are pure waste — ~49M
    params of f32 m+v for a phobert-base backbone, which tripled RSTNet
    checkpoint size and dominated per-epoch save time before masking.
    Returns None when nothing is frozen (callers keep the plain
    optimizer so existing checkpoints/state trees are untouched)."""
    import jax

    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    frozen = [
        any(
            getattr(k, "key", None) == "backbone"
            or (isinstance(getattr(k, "key", None), str)
                and getattr(k, "key").startswith("backbone"))
            for k in path
        )
        for path, _ in leaves_with_path
    ]
    if not any(frozen):
        return None
    _, treedef = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(treedef, [not f for f in frozen])


def mask_frozen(optimizer, params):
    """Wrap ``optimizer`` with ``optax.masked`` over the trainable leaves
    when the param tree contains a frozen backbone; no-op otherwise (the
    state tree stays byte-identical for models without frozen parts)."""
    mask = frozen_param_mask(params)
    if mask is None:
        return optimizer
    return optax.masked(optimizer, mask)
