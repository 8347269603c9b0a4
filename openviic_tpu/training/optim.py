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


def make_rl_optimizer(rl_learning_rate: float):
    """Fresh Adam at a fixed LR for the SCST phase (vi_trainer.py:204)."""
    return optax.adam(learning_rate=rl_learning_rate, b1=0.9, b2=0.999)
