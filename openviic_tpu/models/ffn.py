"""Position-wise feed-forward layer (reference:
models/modules/positionwise_feed_forward.py:6-29): fc1 -> ReLU -> dropout ->
fc2 -> dropout -> post-LN residual."""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

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
