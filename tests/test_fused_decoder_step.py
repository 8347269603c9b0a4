"""Fused decoder-step kernel vs the unfused DecoderLayer.step (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.models.base import make_decode_cache
from openviic_tpu.ops.fused_decoder_step import fused_layer_step
from tests.helpers import D_MODEL, HEAD, model_config
from tests.test_models_forward import make_batch


def extract_layer_weights(params, layer_name):
    """Map a DecoderLayer's params into the fused-kernel weight dict."""
    lp = params["params"]["decoder"][layer_name]

    def kb(node):
        return np.asarray(node["kernel"]), np.asarray(node["bias"])

    sa = lp["self_attn"]["attention"]
    wq, bq = kb(sa["fc_q"]); wk, bk = kb(sa["fc_k"]); wv, bv = kb(sa["fc_v"])
    wo, bo = kb(sa["fc_o"])
    ca = lp["enc_attn"]["attention"]
    wqc, bqc = kb(ca["fc_q"])
    woc, boc = kb(ca["fc_o"])
    w1, b1 = kb(lp["pwff"]["fc1"]); w2, b2 = kb(lp["pwff"]["fc2"])

    def ln(node):
        return np.asarray(node["scale"]), np.asarray(node["bias"])

    ln1s, ln1b = ln(lp["self_attn"]["layer_norm"])
    ln2s, ln2b = ln(lp["enc_attn"]["layer_norm"])
    ln3s, ln3b = ln(lp["pwff"]["layer_norm"])

    return {
        "wqkv": jnp.asarray(np.concatenate([wq, wk, wv], axis=1)),
        "bqkv": jnp.asarray(np.concatenate([bq, bk, bv])),
        "wo": jnp.asarray(wo), "bo": jnp.asarray(bo),
        "ln1s": jnp.asarray(ln1s), "ln1b": jnp.asarray(ln1b),
        "wqc": jnp.asarray(wqc), "bqc": jnp.asarray(bqc),
        "woc": jnp.asarray(woc), "boc": jnp.asarray(boc),
        "ln2s": jnp.asarray(ln2s), "ln2b": jnp.asarray(ln2b),
        "w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
        "w2": jnp.asarray(w2), "b2": jnp.asarray(b2),
        "ln3s": jnp.asarray(ln3s), "ln3b": jnp.asarray(ln3b),
    }


def test_fused_layer_matches_unfused_step(tiny_vocab):
    model = build_model(model_config(), tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    vocab = tiny_vocab
    bs = 2
    L = vocab.max_caption_length

    memory, memory_mask = model.apply(params, batch, method=model.encoder_forward)
    cache = make_decode_cache(model.config.DECODER, vocab, bs)
    cache = model.apply(params, cache, memory, method=model.prepare_cache)

    rng = np.random.default_rng(0)
    tokens = np.full((bs, L), vocab.padding_idx, np.int32)
    tokens[:, 0] = vocab.bos_idx
    tokens[:, 1:4] = rng.integers(4, len(vocab), size=(bs, 3))

    # drive the unfused decode two steps to populate state, capturing the
    # layer-0 inputs/outputs via the public step API on step t=2
    for t in range(2):
        tok_t = jnp.asarray(tokens[:, t : t + 1])
        _, cache = model.apply(
            params, t, tok_t, cache, memory_mask, method=model.decode_step
        )

    t = 2
    tok_t = jnp.asarray(tokens[:, t : t + 1])
    # reference: full unfused step
    ref_lp, ref_cache = model.apply(
        params, t, tok_t, cache, memory_mask, method=model.decode_step
    )

    # fused: replicate layer 0's computation manually
    # build the layer-0 inputs exactly as _DecoderBase.step does
    from openviic_tpu.models.positional import sinusoid_encoding_table

    emb_table = np.asarray(
        params["params"]["decoder"]["word_emb"]["embedding"]["embedding"]
    )
    pos_table = sinusoid_encoding_table(L + 1, D_MODEL, padding_idx=0)
    x = emb_table[tokens[:, t]] + pos_table[t + 1][None, :]
    x = jnp.asarray(x, jnp.float32)

    # masks as the step computes them
    pad = np.array(cache["pad"])
    pad[:, t] = tokens[:, t] == vocab.padding_idx
    future = np.arange(L)[None, :] > t
    self_mask = jnp.asarray(pad | future)
    cross_mask = jnp.asarray(np.asarray(memory_mask)[:, 0, 0, :])

    lc = cache["layers"][0]
    weights = extract_layer_weights(params, "layer_0")
    h = HEAD

    def flat(c):  # (bs, L', h, dk) -> (bs, L', D)
        return jnp.asarray(c).reshape(c.shape[0], c.shape[1], -1)

    y, kc, vc = fused_layer_step(
        x,
        flat(lc["self"]["k"]), flat(lc["self"]["v"]),
        flat(lc["cross"]["k"]), flat(lc["cross"]["v"]),
        self_mask, cross_mask, jnp.asarray(t), weights, n_heads=h,
    )

    ref_k = flat(ref_cache["layers"][0]["self"]["k"])
    np.testing.assert_allclose(np.asarray(kc), np.asarray(ref_k), atol=1e-4)

    # layer-0 output: recompute the unfused layer 0 on the same input
    # (drive just layer 0 through the module API)
    def layer0_only(mdl, t_, tok, cache_, mem_mask):
        pad_, self_mask_ = mdl.decoder._step_masks(tok, t_, cache_)
        embedded, _ = mdl.decoder.word_emb(tok, train=False)
        out = embedded + mdl.decoder.pos_table[t_ + 1][None, None, :].astype(
            embedded.dtype
        )
        out, _ = mdl.decoder.layers[0].step(
            out, cache_["layers"][0], t_,
            self_attention_mask=self_mask_, enc_attention_mask=mem_mask,
        )
        return out

    ref_y = model.apply(
        params, t, tok_t, cache, memory_mask, method=layer0_only
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref_y)[:, 0, :], atol=2e-3,
        err_msg="fused layer output diverges from unfused step",
    )
