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


# ---------------------------------------------- encoder integration (context)
def _model_outputs(arch, encoder, attn, batch, ring_mesh=None):
    from openviic_tpu.builders import build_model
    from openviic_tpu.parallel.ring_attention import ring_attention
    from tests.helpers import model_config

    cfg = model_config(architecture=arch, encoder=encoder, enc_attention=attn)
    model = build_model(cfg, vocab=_TinyVocab())
    params = model.init(jax.random.PRNGKey(0), batch)

    def fwd(params, batch):
        return model.apply(params, batch, method=model.encoder_forward)

    if ring_mesh is None:
        feats, mask = jax.jit(fwd)(params, batch)
    else:
        with ring_attention(ring_mesh, "seq"):
            feats, mask = jax.jit(fwd)(params, batch)
    return np.asarray(feats)


class _TinyVocab:
    def __init__(self, n=30, max_len=12):
        self.itos = ["<pad>", "<bos>", "<eos>", "<unk>"] + [
            f"w{i}" for i in range(n - 4)
        ]
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        self.padding_idx, self.bos_idx, self.eos_idx, self.unk_idx = 0, 1, 2, 3
        self.max_caption_length = max_len
        self.word_embeddings = None

    def __len__(self):
        return len(self.itos)


def _region_batch(bs=2, n=16, d=13, seed=0):
    r = np.random.default_rng(seed)
    boxes = r.uniform(0, 0.5, size=(bs, n, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 0.3
    vocab_len = 12
    caption = np.zeros((bs, vocab_len), np.int32)
    caption[:, 0] = 1
    feats = r.normal(size=(bs, n, d)).astype(np.float32)
    feats[:, -3:] = 0.0  # padded rows -> masked by sum==0
    return {
        "caption_tokens": jnp.asarray(caption),
        "region_features": jnp.asarray(feats),
        "region_boxes": jnp.asarray(boxes),
    }


def test_encoder_ring_context_matches_default():
    """A whole encoder forward under the ring context equals the dense
    path — sequence parallelism without touching model code."""
    batch = _region_batch()
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    base = _model_outputs(
        "StandardTransformerUsingRegion", "Encoder",
        "ScaledDotProductAttention", batch,
    )
    ringed = _model_outputs(
        "StandardTransformerUsingRegion", "Encoder",
        "ScaledDotProductAttention", batch, ring_mesh=mesh,
    )
    np.testing.assert_allclose(ringed, base, atol=2e-5)


def test_geometric_encoder_ring_context_matches_default():
    """ORT's geometric-bias encoder through the ring (bias sharded on the
    query axis inside the kernel)."""
    batch = _region_batch(seed=3)
    mesh = make_mesh({"seq": 2}, jax.devices()[:2])
    base = _model_outputs(
        "ObjectRelationTransformer", "GeometricEncoder",
        "AugmentedGeometryScaledDotProductAttention", batch,
    )
    ringed = _model_outputs(
        "ObjectRelationTransformer", "GeometricEncoder",
        "AugmentedGeometryScaledDotProductAttention", batch, ring_mesh=mesh,
    )
    np.testing.assert_allclose(ringed, base, atol=2e-5)
