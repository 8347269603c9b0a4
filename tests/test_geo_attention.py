"""Fused geometric-bias attention (ops/geo_attention.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.models.geometry import box_relational_embedding
from openviic_tpu.ops.geo_attention import geo_fused_attention
from tests.helpers import model_config
from tests.test_models_forward import make_batch


def _random_case(bs=2, n=10, h=4, dk=8, dg=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(bs, n, h, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bs, n, h, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bs, n, h, dk)), jnp.float32)
    boxes = rng.uniform(0, 0.6, size=(bs, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 0.3
    wg = jnp.asarray(rng.normal(size=(dg, h)) * 0.2, jnp.float32)
    bg = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    pad = np.zeros((bs, 1, 1, n), bool)
    pad[:, :, :, -2:] = True
    return q, k, v, jnp.asarray(boxes), wg, bg, jnp.asarray(pad)


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_materialised_bias_path(seed):
    q, k, v, boxes, wg, bg, pad = _random_case(seed=seed)
    emb = box_relational_embedding(boxes, dim_g=64)
    wts = jax.nn.relu(jnp.einsum("bqkd,dh->bhqk", emb, wg) + bg[None, :, None, None])
    bias = jnp.log(jnp.clip(wts, min=1e-6))
    scale = 1 / np.sqrt(q.shape[-1])
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + bias
    att = jnp.where(pad, -jnp.inf, att)
    att = jax.nn.softmax(att, -1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", att, v)

    got = geo_fused_attention(q, k, v, boxes, wg, bg, pad, sm_scale=scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.05
    )


def test_ort_encoder_fused_matches_default(tiny_vocab, monkeypatch):
    """OPENVIIC_GEO_FUSED=1 swaps the fused kernel into GeometricEncoder
    without changing the model output (bf16 tolerance)."""
    cfg = model_config(
        architecture="ObjectRelationTransformer", encoder="GeometricEncoder",
        decoder="Decoder",
        enc_attention="AugmentedGeometryScaledDotProductAttention",
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    ref = model.apply(params, batch)
    monkeypatch.setenv("OPENVIIC_GEO_FUSED", "1")
    got = model.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=0.05
    )
