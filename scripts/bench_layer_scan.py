"""Microbench: unrolled decoder layers vs lax.scan over stacked weights.

PERF.md's xplane analysis shows the beam-5 decode step is per-op-overhead
bound: ~100 small fusions per step (per-layer weight staging, LN stats,
attention pieces).  A ``lax.scan`` over the layer axis with *stacked*
weights replays one layer's program N times instead of scheduling N
distinct copies — fewer fusions, one stacked weight buffer per matmul
site.  This script measures both formulations on a realistic shape
(64 images x beam 5, d_model 512, 8 heads, 3 layers, L=25 steps) without
touching the production path.

Run on the TPU:  python scripts/bench_layer_scan.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

BS = 320  # 64 images x beam 5
D = 512
H = 8
DK = D // H
FF = 2048
LAYERS = 3
L = 25  # cache length / decode steps
M = 50  # encoder memory length
VOCAB = 10_000
DTYPE = jnp.bfloat16


def _mk_layer(rng):
    r = np.random.default_rng(rng)

    def w(*shape):
        return jnp.asarray(r.normal(size=shape, scale=0.02), DTYPE)

    return {
        "wqkv": w(D, 3 * D), "bqkv": w(3 * D),
        "wo": w(D, D), "bo": w(D),
        "ln1s": w(D), "ln1b": w(D),
        "wqc": w(D, D), "bqc": w(D),
        "woc": w(D, D), "boc": w(D),
        "ln2s": w(D), "ln2b": w(D),
        "w1": w(D, FF), "b1": w(FF),
        "w2": w(FF, D), "b2": w(D),
        "ln3s": w(D), "ln3b": w(D),
    }


def _ln(x, s, b):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + 1e-5)) * s + b).astype(x.dtype)


def _layer_step(x, wts, k_cache, v_cache, ck, cv, t):
    """One decoder layer on a (BS, D) row: self-attn (cached) + cross + FFN."""
    qkv = x @ wts["wqkv"] + wts["bqkv"]
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k_new[:, None, :], t, axis=1
    )
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v_new[:, None, :], t, axis=1
    )
    qh = q.reshape(BS, H, DK)
    kh = k_cache.reshape(BS, L, H, DK)
    vh = v_cache.reshape(BS, L, H, DK)
    scores = jnp.einsum("bhd,blhd->bhl", qh, kh) / np.sqrt(DK)
    mask = jnp.arange(L)[None, None, :] > t
    scores = jnp.where(mask, -1e9, scores.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhl,blhd->bhd", probs, vh).reshape(BS, D)
    x = _ln(x + att @ wts["wo"] + wts["bo"], wts["ln1s"], wts["ln1b"])

    qc = (x @ wts["wqc"] + wts["bqc"]).reshape(BS, H, DK)
    cs = jnp.einsum("bhd,bmhd->bhm", qc, ck) / np.sqrt(DK)
    cp = jax.nn.softmax(cs.astype(jnp.float32), axis=-1).astype(x.dtype)
    catt = jnp.einsum("bhm,bmhd->bhd", cp, cv).reshape(BS, D)
    x = _ln(x + catt @ wts["woc"] + wts["boc"], wts["ln2s"], wts["ln2b"])

    h = jax.nn.relu(x @ wts["w1"] + wts["b1"])
    x = _ln(x + h @ wts["w2"] + wts["b2"], wts["ln3s"], wts["ln3b"])
    return x, k_cache, v_cache


def decode_unrolled(layers, head_w, ck, cv, x0):
    caches_k = [jnp.zeros((BS, L, D), DTYPE) for _ in range(LAYERS)]
    caches_v = [jnp.zeros((BS, L, D), DTYPE) for _ in range(LAYERS)]

    def body(t, carry):
        x, cks, cvs = carry
        new_k, new_v = [], []
        y = x
        for i, wts in enumerate(layers):
            y, k, v = _layer_step(y, wts, cks[i], cvs[i], ck, cv, t)
            new_k.append(k)
            new_v.append(v)
        logits = (y @ head_w).astype(jnp.float32)
        y = jnp.tanh(logits[:, :D]).astype(DTYPE)  # stand-in for selection feedback
        return y, tuple(new_k), tuple(new_v)

    x, _, _ = jax.lax.fori_loop(0, L, body, (x0, tuple(caches_k), tuple(caches_v)))
    return x


def decode_scanned(stacked, head_w, ck, cv, x0):
    caches_k = jnp.zeros((LAYERS, BS, L, D), DTYPE)
    caches_v = jnp.zeros((LAYERS, BS, L, D), DTYPE)

    def body(t, carry):
        x, cks, cvs = carry

        def scan_layer(y, inputs):
            wts, k_cache, v_cache = inputs
            y, k, v = _layer_step(y, wts, k_cache, v_cache, ck, cv, t)
            return y, (k, v)

        y, (new_k, new_v) = jax.lax.scan(scan_layer, x, (stacked, cks, cvs))
        logits = (y @ head_w).astype(jnp.float32)
        y = jnp.tanh(logits[:, :D]).astype(DTYPE)
        return y, new_k, new_v

    x, _, _ = jax.lax.fori_loop(0, L, body, (x0, caches_k, caches_v))
    return x


def _fold_bias(wts):
    """Fold each matmul bias into an augmented weight row: y = [x, 1] @ [[W],[b]].

    Eliminates the per-step staging of the small bias buffers that the
    xplane trace shows dominating the async-copy traffic."""
    out = dict(wts)
    for wk, bk in (("wqkv", "bqkv"), ("wo", "bo"), ("wqc", "bqc"),
                   ("woc", "boc"), ("w1", "b1"), ("w2", "b2")):
        out[wk] = jnp.concatenate([wts[wk], wts[bk][None, :]], axis=0)
        del out[bk]
    return out


def _aug(x):
    return jnp.concatenate([x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)


def _layer_step_folded(x, wts, k_cache, v_cache, ck, cv, t):
    qkv = _aug(x) @ wts["wqkv"]
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k_new[:, None, :], t, axis=1
    )
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v_new[:, None, :], t, axis=1
    )
    qh = q.reshape(BS, H, DK)
    kh = k_cache.reshape(BS, L, H, DK)
    vh = v_cache.reshape(BS, L, H, DK)
    scores = jnp.einsum("bhd,blhd->bhl", qh, kh) / np.sqrt(DK)
    mask = jnp.arange(L)[None, None, :] > t
    scores = jnp.where(mask, -1e9, scores.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhl,blhd->bhd", probs, vh).reshape(BS, D)
    x = _ln(x + _aug(att) @ wts["wo"], wts["ln1s"], wts["ln1b"])

    qc = (_aug(x) @ wts["wqc"]).reshape(BS, H, DK)
    cs = jnp.einsum("bhd,bmhd->bhm", qc, ck) / np.sqrt(DK)
    cp = jax.nn.softmax(cs.astype(jnp.float32), axis=-1).astype(x.dtype)
    catt = jnp.einsum("bhm,bmhd->bhd", cp, cv).reshape(BS, D)
    x = _ln(x + _aug(catt) @ wts["woc"], wts["ln2s"], wts["ln2b"])

    h = jax.nn.relu(_aug(x) @ wts["w1"])
    x = _ln(x + _aug(h) @ wts["w2"], wts["ln3s"], wts["ln3b"])
    return x, k_cache, v_cache


def decode_unrolled_folded(layers, head_w, ck, cv, x0):
    folded = [_fold_bias(w) for w in layers]
    caches_k = [jnp.zeros((BS, L, D), DTYPE) for _ in range(LAYERS)]
    caches_v = [jnp.zeros((BS, L, D), DTYPE) for _ in range(LAYERS)]

    def body(t, carry):
        x, cks, cvs = carry
        new_k, new_v = [], []
        y = x
        for i, wts in enumerate(folded):
            y, k, v = _layer_step_folded(y, wts, cks[i], cvs[i], ck, cv, t)
            new_k.append(k)
            new_v.append(v)
        logits = (y @ head_w).astype(jnp.float32)
        y = jnp.tanh(logits[:, :D]).astype(DTYPE)
        return y, tuple(new_k), tuple(new_v)

    x, _, _ = jax.lax.fori_loop(0, L, body, (x0, tuple(caches_k), tuple(caches_v)))
    return x


def main():
    layers = [_mk_layer(i) for i in range(LAYERS)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    r = np.random.default_rng(99)
    head_w = jnp.asarray(r.normal(size=(D, VOCAB), scale=0.02), DTYPE)
    ck = jnp.asarray(r.normal(size=(BS, M, H, DK), scale=1.0), DTYPE)
    cv = jnp.asarray(r.normal(size=(BS, M, H, DK), scale=1.0), DTYPE)
    x0 = jnp.asarray(r.normal(size=(BS, D), scale=1.0), DTYPE)

    f_unrolled = jax.jit(functools.partial(decode_unrolled, layers, head_w, ck, cv))
    f_scanned = jax.jit(functools.partial(decode_scanned, stacked, head_w, ck, cv))
    f_folded = jax.jit(
        functools.partial(decode_unrolled_folded, layers, head_w, ck, cv)
    )

    for name, fn in [("unrolled", f_unrolled), ("scanned", f_scanned),
                     ("folded", f_folded)]:
        out = fn(x0)
        out.block_until_ready()
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"{name:9s}: {dt*1e3:7.2f} ms / {L}-step decode "
              f"({dt/L*1e6:6.1f} us/step)")

    np.testing.assert_allclose(
        np.asarray(f_unrolled(x0), np.float32),
        np.asarray(f_scanned(x0), np.float32),
        rtol=2e-2, atol=2e-2,
    )
    print("outputs match")


if __name__ == "__main__":
    main()
