"""Position-wise feed-forward layers.

``PositionWiseFeedForward`` matches the reference
(models/modules/positionwise_feed_forward.py:6-29): fc1 -> ReLU ->
dropout -> fc2 -> dropout -> post-LN residual.

``MoEPositionWiseFeedForward`` is beyond parity (the reference has no
MoE — SURVEY.md §2.2 EP row: absent): a Switch-Transformer-style top-1
mixture-of-experts drop-in for the inner MLP, enabled per layer stack by
setting ``MOE_EXPERTS`` in the attention config node.  Expert weights
are stacked on a leading expert axis so expert parallelism is pure
sharding: ``parallel/mesh.py`` shards that axis over an ``expert`` mesh
axis and GSPMD partitions the dispatch/expert/combine einsums — each
device computes only its experts, collectives inserted by XLA."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import random

from openviic_tpu.models.initializers import torch_linear_bias, torch_linear_kernel


class PositionWiseFeedForward(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        d_model, d_ff = cfg.D_MODEL, cfg.D_FF
        self.fc1 = nn.Dense(
            d_ff,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(d_model),
            name="fc1",
        )
        self.fc2 = nn.Dense(
            d_model,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(d_ff),
            name="fc2",
        )
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)
        self.dropout_2 = nn.Dropout(rate=cfg.DROPOUT)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")

    def __call__(self, x, train: bool = False):
        out = self.fc2(self.dropout_2(jax.nn.relu(self.fc1(x)), deterministic=not train))
        out = self.dropout(out, deterministic=not train)
        return self.layer_norm(x + out).astype(x.dtype)


def _stacked_linear_kernel(key, shape, dtype=jnp.float32):
    """Per-expert torch nn.Linear kernel init for (E, fan_in, fan_out)."""
    bound = 1.0 / jnp.sqrt(shape[1])
    return random.uniform(key, shape, dtype, -bound, bound)


def _stacked_linear_bias(fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


class MoEPositionWiseFeedForward(nn.Module):
    """Switch-style top-1 MoE inner MLP with capacity-based dispatch.

    Routing (Switch Transformer): every token goes to its argmax expert,
    gated by the router softmax probability.  Each expert processes at
    most ``C = ceil(capacity_factor * T / E)`` tokens (T = tokens in the
    batch); overflow tokens are dropped from the expert and pass through
    the residual unchanged — the standard capacity trade that keeps every
    shape static for XLA.

    Dispatch/combine are the GShard one-hot einsums: inputs
    ``(T, d) -> (E, C, d)`` via the dispatch mask, expert MLPs run
    batched over the leading expert axis, outputs combine back weighted
    by the gates.  With the expert axis of ``w1/b1/w2/b2`` sharded over
    an ``expert`` mesh axis (parallel/mesh.py) this executes as expert
    parallelism under GSPMD.

    The Switch load-balancing auxiliary loss is exposed via
    ``self.sow("intermediates", "moe_aux_loss", ...)`` for callers that
    want to add it; the trainer's XE objective does not consume it (the
    demonstrator scale trains fine without it).
    """

    config: Any

    def setup(self):
        cfg = self.config
        d_model, d_ff = cfg.D_MODEL, cfg.D_FF
        self.n_experts = int(cfg.MOE_EXPERTS)
        self.capacity_factor = float(
            getattr(cfg, "MOE_CAPACITY_FACTOR", 0) or 1.25
        )
        self.router = nn.Dense(
            self.n_experts, use_bias=False,
            kernel_init=nn.initializers.normal(stddev=0.02), name="router",
        )
        self.w1 = self.param(
            "w1", _stacked_linear_kernel, (self.n_experts, d_model, d_ff)
        )
        self.b1 = self.param(
            "b1", _stacked_linear_bias(d_model), (self.n_experts, d_ff)
        )
        self.w2 = self.param(
            "w2", _stacked_linear_kernel, (self.n_experts, d_ff, d_model)
        )
        self.b2 = self.param(
            "b2", _stacked_linear_bias(d_ff), (self.n_experts, d_model)
        )
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)
        self.dropout_2 = nn.Dropout(rate=cfg.DROPOUT)
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")

    def __call__(self, x, train: bool = False):
        *batch_shape, d = x.shape
        xf = x.reshape(-1, d)
        n_tokens = xf.shape[0]
        e = self.n_experts
        capacity = int(
            max(1, -(-self.capacity_factor * n_tokens // e))
        )

        # top-1 routing in f32 (router logits are tiny; ties broken by
        # argmax's first-index rule, deterministic across backends)
        probs = jax.nn.softmax(
            self.router(xf.astype(jnp.float32)), axis=-1
        )  # (T, E)
        expert_idx = jnp.argmax(probs, axis=-1)  # (T,)
        gate = jnp.take_along_axis(probs, expert_idx[:, None], axis=-1)[:, 0]

        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)  # (T, E)
        # position of each token within its expert's buffer (0-based at the
        # selected expert's column, -1 elsewhere)
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # (T, E)
        kept = (pos >= 0) & (pos < capacity)  # (T, E)
        kept_any = kept.sum(axis=-1).astype(jnp.float32)  # (T,) 1 if kept
        pos_scalar = (pos * kept).sum(axis=-1).astype(jnp.int32)
        dispatch_c = (
            jax.nn.one_hot(pos_scalar, capacity, dtype=jnp.float32)
            * kept_any[:, None]
        )  # (T, C); rows of capacity-dropped tokens are all-zero
        dispatch = onehot[:, :, None] * dispatch_c[:, None, :]  # (T, E, C)
        combine = dispatch * gate[:, None, None]

        # Switch aux loss: E * sum_e(frac_routed_e * mean_router_prob_e)
        self.sow(
            "intermediates",
            "moe_aux_loss",
            e * jnp.sum(jnp.mean(onehot, axis=0) * jnp.mean(probs, axis=0)),
        )

        xe = jnp.einsum("tec,td->ecd", dispatch, xf.astype(jnp.float32))
        h = jax.nn.relu(
            jnp.einsum("ecd,edf->ecf", xe, self.w1) + self.b1[:, None, :]
        )
        h = self.dropout_2(h, deterministic=not train)
        ye = jnp.einsum("ecf,efd->ecd", h, self.w2) + self.b2[:, None, :]
        out = jnp.einsum("tec,ecd->td", combine, ye)

        out = self.dropout(out, deterministic=not train)
        out = out.reshape(*batch_shape, d)
        return self.layer_norm(x + out).astype(x.dtype)


def make_pwff(config, name: str = "pwff"):
    """FFN factory: Switch MoE when ``MOE_EXPERTS`` > 1, else the
    reference-parity dense FFN (all shipped reference configs omit the
    key, so parity paths are unchanged)."""
    if int(getattr(config, "MOE_EXPERTS", 0) or 0) > 1:
        return MoEPositionWiseFeedForward(config, name=name)
    return PositionWiseFeedForward(config, name=name)
