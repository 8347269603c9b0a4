"""Pallas fused attention vs the einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openviic_tpu.ops.pallas_attention import _reference_attention, fused_attention


def rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


@pytest.mark.parametrize(
    "B,nq,nk,h,d",
    [
        (2, 7, 9, 2, 16),      # tiny, unaligned
        (1, 128, 128, 4, 64),  # exactly one block
        (2, 150, 200, 2, 64),  # multiple K blocks
    ],
)
def test_fused_matches_reference(B, nq, nk, h, d):
    q = rand((B, nq, h, d), 0)
    k = rand((B, nk, h, d), 1)
    v = rand((B, nk, h, d), 2)
    out = fused_attention(q, k, v)
    ref = _reference_attention(q, k, v, None, 1.0 / d**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_with_bias_and_mask():
    B, nq, nk, h, d = 2, 10, 12, 2, 32
    q, k, v = rand((B, nq, h, d), 0), rand((B, nk, h, d), 1), rand((B, nk, h, d), 2)
    # additive bias including -1e30 "mask" entries on some columns
    bias = np.zeros((B, h, nq, nk), np.float32)
    bias[:, :, :, -3:] = -1e30
    bias[:, :, :, 0] = 1.5
    bias = jnp.asarray(bias)
    out = fused_attention(q, k, v, bias=bias)
    ref = _reference_attention(q, k, v, bias, 1.0 / d**0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # masked columns actually ignored: perturbing their values changes nothing
    v2 = v.at[:, -3:, :, :].set(999.0)
    out2 = fused_attention(q, k, v2, bias=bias)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=2e-5)


def test_fully_masked_row_is_finite():
    B, nq, nk, h, d = 1, 4, 6, 1, 8
    q, k, v = rand((B, nq, h, d), 0), rand((B, nk, h, d), 1), rand((B, nk, h, d), 2)
    bias = jnp.full((B, h, nq, nk), -1e30)
    out = fused_attention(q, k, v, bias=bias)
    assert np.isfinite(np.asarray(out)).all()
