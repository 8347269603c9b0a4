"""Capture an xplane trace of the reference-scale XE step and print the
top device ops (dispatch via scripts/xplane_top.py).

Usage: python scripts/profile_xe.py [/tmp/xe_trace] [--rbg]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--rbg" in sys.argv:
    jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/xe_trace"

    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.training.optim import make_optimizer
    from openviic_tpu.training.steps import make_xe_step

    VOCAB, MAX_LEN, D, H, L, FF, DF = 10_000, 25, 512, 8, 3, 2048, 1024
    BS = 60
    vocab = _tiny_vocab(size=VOCAB, max_len=MAX_LEN)
    model = build_model(_model_config(D, H, L, FF, DF), vocab)
    batch = _make_batch(vocab, bs=BS, n_regions=50, d_feature=DF)
    params = model.init(jax.random.PRNGKey(0), batch)
    optimizer = make_optimizer(D, warmup=10000)
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": 0,
        "rng": jax.random.PRNGKey(1),
    }
    step = make_xe_step(model, optimizer, mixed_precision=True)
    for _ in range(3):
        state, loss = step(state, batch)
        np.asarray(loss)

    with jax.profiler.trace(out_dir):
        for _ in range(10):
            state, loss = step(state, batch)
        np.asarray(loss)
    print(f"trace written to {out_dir}")


if __name__ == "__main__":
    main()
