"""Dated re-test of the fused Pallas decode kernels on the current
toolchain (VERDICT r2 #10).

The resident-layer kernel (ops/resident_layer_step.py) and head+top-k
kernel (ops/head_topk.py) lost to the XLA path on the round-2 toolchain
(Mosaic lowering limits: 5-d transpose, multi-batch-dim dot, padded-lane
reshapes — see the module docstrings).  This script re-runs both at bench
shapes on the real chip and prints a dated verdict line for PERF.md, so
each toolchain drop gets a fresh data point.

Usage:  python scripts/retry_resident_kernel.py [batch_size]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure(decode, params, batch, iters=10):
    for _ in range(2):
        np.asarray(decode(params, batch=batch)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        outs, _ = decode(params, batch=batch)
    np.asarray(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import bench
    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search

    print(f"jax {jax.__version__}, jaxlib {jax.lib.__version__}, "
          f"backend {jax.default_backend()}, devices {jax.devices()}")
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
    config = _model_config(bench.D_MODEL, bench.HEADS, bench.LAYERS,
                           bench.D_FF, bench.D_FEATURE)
    model = build_model(config, vocab)
    batch = _make_batch(vocab, bs=bs, n_regions=bench.N_REGIONS,
                        d_feature=bench.D_FEATURE)
    batch = {"region_features": batch["region_features"]}
    params = model.init(
        jax.random.PRNGKey(0),
        dict(batch, caption_tokens=np.zeros((bs, bench.MAX_LEN), np.int32)),
    )

    variants = {
        "xla_beam_resident": dict(beam_resident=True),
        "resident_kernel": dict(resident_kernel=True),
        "head_topk_kernel": dict(head_kernel=True),
        "attn_kernel": dict(attn_kernel=True),
        "attn+head_kernel": dict(attn_kernel=True, head_kernel=True),
    }
    if len(sys.argv) > 2:  # comma list selects a subset (compile time)
        keep = sys.argv[2].split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    results = {}
    times = {}
    for name, kw in variants.items():
        decode = jax.jit(functools.partial(
            beam_search, model, beam_size=bench.BEAM, out_size=1,
            compute_dtype=jnp.bfloat16, **kw,
        ))
        try:
            dt = measure(decode, params, batch)
            times[name] = dt
            results[name] = f"{dt*1e3:.1f} ms/batch-{bs} ({bs/dt:.0f} captions/s)"
        except Exception as e:  # Mosaic lowering failures land here
            first = str(e).splitlines()[0][:160]
            results[name] = f"FAILED: {type(e).__name__}: {first}"
        print(f"  {name:20s} {results[name]}", flush=True)

    import datetime
    stamp = datetime.date.today().isoformat()
    base = times.get("xla_beam_resident")
    winners = [
        n for n, t in times.items()
        if n != "xla_beam_resident" and base is not None and t < base
    ]
    verdict = (
        f"faster than XLA path: {', '.join(winners)}" if winners
        else "XLA path remains fastest"
    )
    print(f"RESIDENT_RETRY {stamp}: {verdict} | " +
          " | ".join(f"{k}={v}" for k, v in results.items()))


if __name__ == "__main__":
    main()
