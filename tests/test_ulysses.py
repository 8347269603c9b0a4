"""Ulysses all-to-all sequence parallelism (parallel/ulysses.py) vs the
dense reference and the ring layout, on a virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

from openviic_tpu.parallel import make_mesh
from openviic_tpu.parallel.ulysses import ulysses_self_attention

# the package re-exports the ring_attention *function*, which shadows the
# module of the same name — import the modules explicitly
ring_mod = importlib.import_module("openviic_tpu.parallel.ring_attention")
ulysses_mod = importlib.import_module("openviic_tpu.parallel.ulysses")


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
    out = ulysses_self_attention(q, k, v, mesh)
    ref = _dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_dense_with_bias_and_mask():
    q, k, v = _qkv(seed=1)
    b, n, h, _ = q.shape
    bias = jnp.asarray(
        np.random.default_rng(2).normal(size=(b, h, n, n)).astype(np.float32)
    )
    mask = np.zeros((b, n), bool)
    mask[:, -7:] = True  # pad tail masked, crosses the shard boundary
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    out = ulysses_self_attention(
        q, k, v, mesh, bias=bias, key_mask=jnp.asarray(mask)
    )
    ref = _dense_reference(q, k, v, bias=bias, key_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_data_seq_mesh():
    q, k, v = _qkv(b=4, seed=4)
    b, n, h, _ = q.shape
    bias = jnp.asarray(
        np.random.default_rng(5).normal(size=(b, h, n, n)).astype(np.float32)
    )
    mask = np.zeros((b, n), bool)
    mask[:, ::5] = True
    mesh = make_mesh({"data": 2, "seq": 4}, jax.devices()[:8])
    out = ulysses_self_attention(
        q, k, v, mesh, bias=bias, key_mask=jnp.asarray(mask),
        batch_axis="data",
    )
    ref = _dense_reference(q, k, v, bias=bias, key_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_matches_ring_layout():
    """Both sequence-parallel layouts agree with each other (and dense)."""
    from openviic_tpu.parallel import ring_self_attention

    q, k, v = _qkv(seed=6)
    mesh = make_mesh({"seq": 2}, jax.devices()[:2])
    u = ulysses_self_attention(q, k, v, mesh)
    r = ring_self_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(u), np.asarray(r), atol=1e-5)


def test_grad_matches_dense():
    """The two all-to-alls are linear ops — gradients flow through and
    match the dense path (sequence-parallel *training*, not just eval)."""
    q, k, v = _qkv(n=16, seed=7)
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])

    def loss_ul(q, k, v):
        return jnp.sum(ulysses_self_attention(q, k, v, mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_reference(q, k, v).astype(q.dtype) ** 2)

    gu = jax.grad(loss_ul, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gu, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_rejects_indivisible():
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])
    q, k, v = _qkv(n=30)
    with pytest.raises(ValueError):
        ulysses_self_attention(q, k, v, mesh)
    q, k, v = _qkv(h=6)  # 6 heads on a 4-way axis
    with pytest.raises(ValueError):
        ulysses_self_attention(q, k, v, mesh)


# ---------------------------------------------- encoder integration (context)
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
    caption = np.zeros((bs, 12), np.int32)
    caption[:, 0] = 1
    feats = r.normal(size=(bs, n, d)).astype(np.float32)
    feats[:, -3:] = 0.0  # padded rows -> masked by sum==0
    return {
        "caption_tokens": jnp.asarray(caption),
        "region_features": jnp.asarray(feats),
        "region_boxes": jnp.asarray(boxes),
    }


def _encoder_outputs(batch, sp_mesh=None, mode="ring"):
    from openviic_tpu.builders import build_model
    from openviic_tpu.parallel.ring_attention import ring_attention
    from tests.helpers import model_config

    cfg = model_config(
        architecture="StandardTransformerUsingRegion", encoder="Encoder",
        enc_attention="ScaledDotProductAttention",
    )
    model = build_model(cfg, vocab=_TinyVocab())
    params = model.init(jax.random.PRNGKey(0), batch)

    def fwd(params, batch):
        return model.apply(params, batch, method=model.encoder_forward)

    if sp_mesh is None:
        feats, _ = jax.jit(fwd)(params, batch)
    else:
        with ring_attention(sp_mesh, "seq", mode=mode):
            feats, _ = jax.jit(fwd)(params, batch)
    return np.asarray(feats)


def test_encoder_ulysses_context_matches_default():
    """A whole encoder forward under mode="ulysses" equals the dense path
    and actually takes the all-to-all layout (test heads = 2, so seq=2)."""
    batch = _region_batch()
    mesh = make_mesh({"seq": 2}, jax.devices()[:2])
    base = _encoder_outputs(batch)
    before = ulysses_mod.DISPATCH_STATS["traces"]
    out = _encoder_outputs(batch, sp_mesh=mesh, mode="ulysses")
    assert ulysses_mod.DISPATCH_STATS["traces"] > before
    np.testing.assert_allclose(out, base, atol=2e-5)


def test_indivisible_heads_fall_back_to_ring():
    """mode="ulysses" on a seq axis the head count doesn't divide still
    executes sequence-parallel — via the ring layout."""
    batch = _region_batch(seed=3)
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])  # heads=2, 2 % 4 != 0
    base = _encoder_outputs(batch)
    u_before = ulysses_mod.DISPATCH_STATS["traces"]
    r_before = ring_mod.DISPATCH_STATS["traces"]
    out = _encoder_outputs(batch, sp_mesh=mesh, mode="ulysses")
    assert ulysses_mod.DISPATCH_STATS["traces"] == u_before
    assert ring_mod.DISPATCH_STATS["traces"] > r_before
    np.testing.assert_allclose(out, base, atol=2e-5)
