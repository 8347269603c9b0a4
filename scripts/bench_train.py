"""Training-throughput microbench at reference scale (run on TPU).

Measures: XE step time (batch 60, the reference's FEATURE_BATCH_SIZE),
SCST iteration time (sample + native CIDEr reward + rescore step), and
prints captions/sec for each phase."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
from openviic_tpu.builders import build_model
from openviic_tpu.decoding import beam_search
from openviic_tpu.training.optim import make_optimizer, make_rl_optimizer
from openviic_tpu.training.steps import make_scst_grad_step, make_xe_step

VOCAB, MAX_LEN, D, H, L, FF, DF = 10_000, 25, 512, 8, 3, 2048, 1024
XE_BATCH = 60
SCST_IMAGES = 12
BEAM = 5


def main() -> None:
    vocab = _tiny_vocab(size=VOCAB, max_len=MAX_LEN)
    config = _model_config(D, H, L, FF, DF)
    model = build_model(config, vocab)

    batch = _make_batch(vocab, bs=XE_BATCH, n_regions=50, d_feature=DF)
    params = model.init(jax.random.PRNGKey(0), batch)
    # keep a copy: the steps donate their state, invalidating these buffers
    params_copy = jax.tree.map(jnp.copy, params)
    optimizer = make_optimizer(D, warmup=10000)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": 0,
        "rng": jax.random.PRNGKey(1),
    }
    xe_step = make_xe_step(model, optimizer)

    state, loss = xe_step(state, batch)
    np.asarray(loss)
    state, loss = xe_step(state, batch)
    np.asarray(loss)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = xe_step(state, batch)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"XE step: {dt*1000:.1f} ms  ({XE_BATCH/dt:.0f} captions/s)")

    # mixed-precision XE step (TRAINING.MIXED_PRECISION: bf16 fwd/bwd
    # against the same f32 master params/optimizer)
    xe_step_bf16 = make_xe_step(model, optimizer, mixed_precision=True)
    state_mp = {
        "params": params_copy,
        "opt_state": optimizer.init(params_copy),
        "step": 0,
        "rng": jax.random.PRNGKey(1),
    }
    state_mp, loss = xe_step_bf16(state_mp, batch)
    np.asarray(loss)
    state_mp, loss = xe_step_bf16(state_mp, batch)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        state_mp, loss = xe_step_bf16(state_mp, batch)
    np.asarray(loss)
    dt_mp = (time.perf_counter() - t0) / 20
    print(f"XE step (bf16): {dt_mp*1000:.1f} ms  ({XE_BATCH/dt_mp:.0f} captions/s)")

    # analytic speed-of-light: matmul FLOPs of one fwd+bwd step at this shape
    def _mha(nq, nk, d):
        proj = 2 * 3 * nq * d * d if nq == nk else 2 * (nq * d * d + 2 * nk * d * d)
        return proj + 2 * 2 * nq * nk * d + 2 * nq * d * d

    n_reg, n_cap = 50, MAX_LEN
    fwd = (
        2 * n_reg * DF * D
        + L * (_mha(n_reg, n_reg, D) + 4 * n_reg * D * FF)
        + L * _mha(n_cap, n_cap, D)
        + L * (2 * (n_cap * D * D + 2 * n_reg * D * D) + 4 * n_cap * n_reg * D + 2 * n_cap * D * D)
        + L * 4 * n_cap * D * FF
        + 2 * n_cap * D * VOCAB
    ) * XE_BATCH
    step_flops = 3 * fwd  # fwd + ~2x for bwd
    print(
        f"  analytic: {step_flops/1e9:.0f} GFLOP/step -> SOL "
        f"{step_flops/197e12*1e3:.1f} ms bf16 / {step_flops/49e12*1e3:.1f} ms fp32 (v5e); "
        f"measured MXU util ~{step_flops/49e12/dt*100:.0f}% (fp32), "
        f"~{step_flops/197e12/dt_mp*100:.0f}% (bf16)"
    )

    # ---- SCST iteration --------------------------------------------------
    from openviic_tpu import native

    scst_batch = _make_batch(vocab, bs=SCST_IMAGES, n_regions=50, d_feature=DF)
    scst_batch = {"region_features": scst_batch["region_features"]}
    rl_opt = make_rl_optimizer(5e-6)
    rl_state = {
        "params": state["params"],
        "opt_state": rl_opt.init(state["params"]),
        "step": 0,
        "rng": jax.random.PRNGKey(2),
    }
    scst_step = make_scst_grad_step(model, rl_opt, BEAM)
    sample = jax.jit(
        functools.partial(
            beam_search, model, beam_size=BEAM, out_size=BEAM,
            compute_dtype=jnp.bfloat16, beam_resident=True,
        )
    )

    # synthetic reward corpus for the native CIDEr
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(200)]
    train_gts = {
        str(i): [" ".join(rng.choice(words, 10))] for i in range(1000)
    }
    cider = (
        native.NativeCider(gts=train_gts)
        if native.available()
        else __import__(
            "openviic_tpu.evaluation", fromlist=["Cider"]
        ).Cider(train_gts)
    )

    def scst_iter():
        nonlocal rl_state
        outs, _ = sample(rl_state["params"], batch=scst_batch)
        sampled = np.asarray(outs).reshape(SCST_IMAGES * BEAM, -1)
        caps = []
        for row in sampled:
            toks = []
            for idx in row:
                if idx == vocab.eos_idx:
                    break
                if idx > 3:
                    toks.append(vocab.itos[idx])
            caps.append(" ".join(toks))
        gens = {str(i): [c] for i, c in enumerate(caps)}
        gts = {str(i): [" ".join(rng.choice(words, 10))] for i in range(len(caps))}
        reward = cider.compute_score(gts, gens)[1].astype(np.float32)
        reward = jnp.asarray(reward.reshape(SCST_IMAGES, BEAM))
        rl_state, loss = scst_step(rl_state, scst_batch, jnp.asarray(sampled), reward)
        return float(loss)

    scst_iter()
    scst_iter()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        scst_iter()
    dt = (time.perf_counter() - t0) / iters
    print(f"SCST iter (batch {SCST_IMAGES}): {dt*1000:.1f} ms  ({SCST_IMAGES/dt:.0f} images/s)")

    # bigger SCST batch (PERF.md scaling note: decode latency is nearly
    # batch-independent below ~64 images)
    big = 60
    scst_batch = _make_batch(vocab, bs=big, n_regions=50, d_feature=DF)
    scst_batch = {"region_features": scst_batch["region_features"]}

    def scst_iter_big():
        nonlocal rl_state
        outs, _ = sample(rl_state["params"], batch=scst_batch)
        sampled = np.asarray(outs).reshape(big * BEAM, -1)
        caps = []
        for row in sampled:
            toks = []
            for idx in row:
                if idx == vocab.eos_idx:
                    break
                if idx > 3:
                    toks.append(vocab.itos[idx])
            caps.append(" ".join(toks))
        gens = {str(i): [c] for i, c in enumerate(caps)}
        gts = {str(i): [" ".join(rng.choice(words, 10))] for i in range(len(caps))}
        reward = cider.compute_score(gts, gens)[1].astype(np.float32)
        reward = jnp.asarray(reward.reshape(big, BEAM))
        rl_state, loss = scst_step(rl_state, scst_batch, jnp.asarray(sampled), reward)
        return float(loss)

    scst_iter_big()
    scst_iter_big()
    t0 = time.perf_counter()
    for _ in range(iters):
        scst_iter_big()
    dt = (time.perf_counter() - t0) / iters
    print(f"SCST iter (batch {big}): {dt*1000:.1f} ms  ({big/dt:.0f} images/s)")


if __name__ == "__main__":
    main()
