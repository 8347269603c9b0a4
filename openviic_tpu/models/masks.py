"""Mask helpers.  Convention: ``True`` = masked (matches the reference).

Reference equivalents: ``generate_padding_mask`` (models/utils.py:48-61) and
``generate_sequential_mask`` (models/utils.py:63-70).  The padding mask is
built from the "sum over the last dim == padding_idx" quirk, which flags
both pad tokens (id 0) and all-zero feature rows — the data layer guarantees
padded feature rows are exactly zero, so this convention is load-bearing.
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_padding_mask(sequences: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """(bs, seq_len) ids or (bs, seq_len, dim) features -> (bs, 1, 1, seq_len) bool."""
    if sequences is None:
        return None
    if sequences.ndim == 2:
        seq = sequences[..., None]
    else:
        seq = sequences
    mask = jnp.sum(seq, axis=-1) == padding_idx  # (bs, seq_len)
    return mask[:, None, None, :]


def generate_sequential_mask(seq_len: int) -> jnp.ndarray:
    """Upper-triangular causal mask -> (1, 1, seq_len, seq_len) bool."""
    mask = jnp.triu(jnp.ones((seq_len, seq_len), dtype=bool), k=1)
    return mask[None, None, :, :]
