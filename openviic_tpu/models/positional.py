"""Positional encodings.

Reference equivalents: ``sinusoid_encoding_table`` (models/utils.py:21-40),
DETR-style ``SinusoidPositionalEmbedding`` (models/modules/pos_embeddings.py:39-72).
Both are pure functions here — no parameters, no buffers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoid_encoding_table(
    max_len: int, d_model: int, padding_idx: int | None = None
) -> np.ndarray:
    """Classic interleaved sin/cos table, row ``padding_idx`` zeroed.

    Matches models/utils.py:21-40: the sin/cos pair at dims (2i, 2i+1) share
    the argument pos / 10000**(2i/d_model)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]  # (max_len, 1)
    dim = np.arange(d_model // 2, dtype=np.float32)[None, :]  # (1, d/2)
    angle = pos / np.power(10000.0, 2.0 * dim / d_model)
    out = np.zeros((max_len, d_model), dtype=np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    if padding_idx is not None:
        out[padding_idx] = 0.0
    return out


def sinusoid_positional_embedding(
    x: jnp.ndarray,
    num_pos_feats: int,
    mask: jnp.ndarray | None = None,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: float | None = None,
) -> jnp.ndarray:
    """DETR-style 1D positional embedding over the sequence axis.

    ``x``: (bs, seq, d).  Positions are the cumulative count of unmasked
    entries (so they start at 1), matching pos_embeddings.py:58-72.
    """
    if scale is None:
        scale = 2.0 * np.pi
    if mask is None:
        not_mask = jnp.ones(x.shape[:-1], dtype=jnp.float32)
    else:
        not_mask = (~mask).astype(jnp.float32)
    embed = jnp.cumsum(not_mask, axis=1)
    if normalize:
        eps = 1e-6
        embed = embed / (embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos = embed[:, :, None] / dim_t  # (bs, seq, num_pos_feats)
    pos = jnp.stack(
        (jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])), axis=-1
    ).reshape(*pos.shape[:-1], -1)
    return pos


class PositionalEmbedding:
    """Classic fixed sin/cos table added over the sequence axis.

    Reference: models/modules/pos_embeddings.py:6-24 (unused by shipped
    architectures; provided for inventory parity).  Stateless: call with
    (bs, seq, d) and get x + pe[:seq]."""

    def __init__(self, d_model: int, max_len: int = 5000):
        import math

        pos = np.arange(max_len, dtype=np.float32)[:, None]
        div = np.exp(
            np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
        )
        pe = np.zeros((max_len, d_model), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        self.pe = pe

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + jnp.asarray(self.pe[: x.shape[1]])[None, :, :]


def learned_positional_embedding_init(max_len: int, d_model: int):
    """Init spec for a learned positional table (pos_embeddings.py:26-37):
    N(0,1) of shape (1, max_len, d_model); use with ``nn.Module.param``."""
    from openviic_tpu.models.initializers import torch_embedding_init

    def init(key, shape=None, dtype=jnp.float32):
        return torch_embedding_init(key, (1, max_len, d_model), dtype)

    return init
