"""Capture an xplane trace of the bench decode and print the top ops.

Usage: python scripts/profile_decode.py [/tmp/decode_trace] [--head-kernel]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = [a for a in sys.argv[1:] if a != "--head-kernel"]
    head_kernel = "--head-kernel" in sys.argv[1:]
    out_dir = args[0] if args else "/tmp/decode_trace"

    import bench
    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search

    vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
    config = _model_config(bench.D_MODEL, bench.HEADS, bench.LAYERS,
                           bench.D_FF, bench.D_FEATURE)
    model = build_model(config, vocab)
    batch = _make_batch(vocab, bs=bench.JAX_BATCH, n_regions=bench.N_REGIONS,
                        d_feature=bench.D_FEATURE)
    batch = {"region_features": batch["region_features"]}
    params = model.init(
        jax.random.PRNGKey(0),
        dict(batch, caption_tokens=np.zeros(
            (bench.JAX_BATCH, bench.MAX_LEN), np.int32)),
    )
    decode = jax.jit(functools.partial(
        beam_search, model, beam_size=bench.BEAM, out_size=1,
        compute_dtype=jnp.bfloat16, beam_resident=True,
        head_kernel=head_kernel,
    ))
    for _ in range(2):
        np.asarray(decode(params, batch=batch)[0])

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            outs, _ = decode(params, batch=batch)
        np.asarray(outs)

    import subprocess

    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "xplane_top.py"),
                    out_dir, "40"])


if __name__ == "__main__":
    main()
