"""Weight initializers matching the reference's torch init conventions.

The reference mixes two schemes: modules with an explicit ``init_weights``
use xavier_uniform kernels + zero biases (e.g. models/modules/attentions.py:34-42),
everything else keeps torch's ``nn.Linear`` default (kaiming-uniform kernel,
uniform bias scaled by 1/sqrt(fan_in)).  Exact parity of *distributions* is
what matters for training dynamics; greedy-parity tests load identical
weights explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    flax kernel shape is (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_stddev(stddev: float):
    return nn.initializers.normal(stddev=stddev)


def torch_embedding_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return random.normal(key, shape, dtype)
