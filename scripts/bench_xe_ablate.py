"""XE-step bottleneck ablation (run on TPU).

The XE step measures ~11.8 ms while its fp32 matmul speed-of-light is
~7.3 ms and bf16 moves it barely (bench_train.py) — so the cost is not in
the MXU.  This script isolates the non-matmul suspects: dropout RNG
generation (threefry on every activation tensor), the counter-based RNG
implementation, and their interaction with bf16."""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--partitionable" in sys.argv:
    jax.config.update("jax_threefry_partitionable", True)
if "--rbg" in sys.argv:
    jax.config.update("jax_default_prng_impl", "rbg")

from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
from openviic_tpu.builders import build_model
from openviic_tpu.training.optim import make_optimizer
from openviic_tpu.training.steps import make_xe_step

VOCAB, MAX_LEN, D, H, L, FF, DF = 10_000, 25, 512, 8, 3, 2048, 1024
BS = 60


def zero_dropout(cfg):
    def walk(node):
        for key in list(node._data):
            v = node._data[key]
            if key == "DROPOUT":
                node._data[key] = 0.0
            elif hasattr(v, "_data"):
                walk(v)
    walk(cfg)
    return cfg


def measure(mixed, dropout):
    vocab = _tiny_vocab(size=VOCAB, max_len=MAX_LEN)
    config = _model_config(D, H, L, FF, DF)
    if not dropout:
        config = zero_dropout(config)
    model = build_model(config, vocab)
    batch = _make_batch(vocab, bs=BS, n_regions=50, d_feature=DF)
    params = model.init(jax.random.PRNGKey(0), batch)
    optimizer = make_optimizer(D, warmup=10000)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": 0,
        "rng": jax.random.PRNGKey(1),
    }
    step = make_xe_step(model, optimizer, mixed_precision=mixed)
    state, loss = step(state, batch)
    np.asarray(loss)
    state, loss = step(state, batch)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        state, loss = step(state, batch)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / 20
    tag = f"{'bf16' if mixed else 'f32 '} dropout={'0.1' if dropout else '0  '}"
    print(f"{tag}: {dt*1e3:6.1f} ms  ({BS/dt:5.0f} captions/s)")
    return dt


def main():
    for mixed in (False, True):
        for dropout in (True, False):
            measure(mixed, dropout)


if __name__ == "__main__":
    main()
