"""Ring attention (parallel/ring_attention.py) vs dense reference on a
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.parallel import make_mesh
from openviic_tpu.parallel.ring_attention import ring_self_attention


def _dense_reference(q, k, v, bias=None, key_mask=None):
    scale = 1.0 / np.sqrt(q.shape[-1])
    qh = jnp.swapaxes(q, 1, 2).astype(jnp.float32)
    kh = jnp.swapaxes(k, 1, 2).astype(jnp.float32)
    vh = jnp.swapaxes(v, 1, 2).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return jnp.swapaxes(out, 1, 2)


def _qkv(b=2, n=32, h=4, d=16, seed=0):
    r = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(r.normal(size=(b, n, h, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_matches_dense():
    q, k, v = _qkv()
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    out = ring_self_attention(q, k, v, mesh)
    ref = _dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_dense_with_bias():
    q, k, v = _qkv(seed=1)
    b, n, h, _ = q.shape
    bias = jnp.asarray(
        np.random.default_rng(2).normal(size=(b, h, n, n)).astype(np.float32)
    )
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    out = ring_self_attention(q, k, v, mesh, bias=bias)
    ref = _dense_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_dense_with_key_mask():
    q, k, v = _qkv(seed=3)
    b, n = q.shape[:2]
    mask = np.zeros((b, n), bool)
    mask[:, -7:] = True  # pad tail masked, crosses the shard boundary
    mask_j = jnp.asarray(mask)
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    out = ring_self_attention(q, k, v, mesh, key_mask=mask_j)
    ref = _dense_reference(q, k, v, key_mask=mask_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bias_and_mask_on_data_seq_mesh():
    q, k, v = _qkv(b=4, seed=4)
    b, n, h, _ = q.shape
    bias = jnp.asarray(
        np.random.default_rng(5).normal(size=(b, h, n, n)).astype(np.float32)
    )
    mask = np.zeros((b, n), bool)
    mask[:, ::5] = True
    mask_j = jnp.asarray(mask)
    mesh = make_mesh({"data": 2, "seq": 4}, jax.devices()[:8])
    out = ring_self_attention(
        q, k, v, mesh, bias=bias, key_mask=mask_j, batch_axis="data"
    )
    ref = _dense_reference(q, k, v, bias=bias, key_mask=mask_j)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_geometry_bias_end_to_end():
    """The ORT geometric bias (log-relu path) through the ring — the
    DLCT/ORT long-context scale-out this module exists for."""
    from openviic_tpu.models.geometry import box_relational_embedding

    r = np.random.default_rng(6)
    b, n, h, d = 2, 24, 4, 8
    boxes = r.uniform(0, 1, size=(b, n, 4)).astype(np.float32)
    boxes[:, :, 2:] = boxes[:, :, :2] + 0.1
    emb = box_relational_embedding(jnp.asarray(boxes), dim_g=64)
    w = jnp.asarray(r.normal(size=(64, h)).astype(np.float32) * 0.5)
    geo = jax.nn.relu(jnp.einsum("bqkg,gh->bhqk", emb, w))
    bias = jnp.log(jnp.clip(geo, 1e-6, None))

    q, k, v = _qkv(b=b, n=n, h=h, d=d, seed=7)
    mesh = make_mesh({"seq": 2}, jax.devices()[:2])
    out = ring_self_attention(q, k, v, mesh, bias=bias)
    ref = _dense_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rejects_indivisible_sequence():
    q, k, v = _qkv(n=30)
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    with pytest.raises(ValueError):
        ring_self_attention(q, k, v, mesh)
