"""Greedy (beam-1) decode throughput, with and without the head+top-k kernel.

PERF.md's greedy numbers (12 455 captions/s at batch 256) predate the
fused head+lse+top-k kernel (ops/head_topk.py) that won +20% on beam-5;
head_topk with k=1 covers greedy too.  This re-measures the greedy
scaling curve both ways.

Usage: python scripts/bench_greedy.py [batches...]   (default 64 256 512)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import bench


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256, 512]

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding.beam_search import BeamSearcher

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
    config = _model_config(bench.D_MODEL, bench.HEADS, bench.LAYERS,
                           bench.D_FF, bench.D_FEATURE)
    model = build_model(config, vocab)
    b0 = _make_batch(vocab, bs=1, n_regions=bench.N_REGIONS,
                     d_feature=bench.D_FEATURE)
    params = model.init(
        jax.random.PRNGKey(0),
        dict(region_features=b0["region_features"],
             caption_tokens=np.zeros((1, bench.MAX_LEN), np.int32)),
    )

    # jit beam_search directly so head_kernel is FORCED either way —
    # BeamSearcher(head_kernel=True) is an auto-gate that would silently
    # fall back to the XLA path below its measured win region
    import functools

    from openviic_tpu.decoding.beam_search import beam_search

    searchers = {
        name: jax.jit(functools.partial(
            beam_search, model, beam_size=1, compute_dtype=jnp.bfloat16,
            beam_resident=True, head_kernel=hk,
        ))
        for name, hk in (("xla", False), ("head_kernel", True))
    }
    for bs in sizes:
        batch = _make_batch(vocab, bs=bs, n_regions=bench.N_REGIONS,
                            d_feature=bench.D_FEATURE)
        feats = {"region_features": batch["region_features"]}
        tok = {}
        for name, s in searchers.items():
            try:
                out, _ = s(params, batch=feats)
                tok[name] = np.asarray(out)
                n_iters = 10
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    out, _ = s(params, batch=feats)
                np.asarray(out)
                dt = (time.perf_counter() - t0) / n_iters
                print(f"bs={bs:4d} {name:12s} {dt * 1e3:7.1f} ms/batch "
                      f"({bs / dt:8.0f} captions/s)", flush=True)
            except Exception as e:  # pragma: no cover
                print(f"bs={bs:4d} {name:12s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        if len(tok) == 2:
            same = np.array_equal(tok["xla"], tok["head_kernel"])
            print(f"          token-identical: {same}")


if __name__ == "__main__":
    main()
