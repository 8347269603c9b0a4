"""bs=1 beam-5 latency sweep: step-graph consolidation variants.

VERDICT r4 weak #2 / next #6: p50 pipelined sat at 2.54 ms vs the
1.1 ms weight-streaming floor with no dedicated small-N attempt — the
large-batch consolidation negatives (unroll slower, resident kernel 2x
slower) were measured in the compute-bound regime and don't transfer to
N = 5 rows where every op is latency-bound.  This sweep measures, at
bs=1 (the bench.py p50 methodology: K back-to-back async dispatches,
one D2H sync, divided by K):

  - while      : the production while_loop early-exit path (baseline)
  - scan       : early_exit=False plain scan (no loop-condition sync)
  - unroll4/8  : partially-unrolled while_loop (early exit at coarser
                 granularity, XLA pipelines across fused steps)
  - full       : fully-unrolled 25-step straight-line graph (static t)
  - x(variants): each with/without the fused head+top-k kernel

Usage: python scripts/bench_bs1_sweep.py [--iters 30] [--reps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default=None,
                    help="comma list to subset (e.g. while,scan,unroll4)")
    ap.add_argument("--no-hk", action="store_true",
                    help="skip the head-kernel twins")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search

    vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
    config = _model_config(
        bench.D_MODEL, bench.HEADS, bench.LAYERS, bench.D_FF,
        bench.D_FEATURE,
    )
    model = build_model(config, vocab)
    batch = _make_batch(
        vocab, bs=1, n_regions=bench.N_REGIONS, d_feature=bench.D_FEATURE
    )
    one = {"region_features": batch["region_features"]}
    params = model.init(
        jax.random.PRNGKey(0),
        dict(one, caption_tokens=np.zeros((1, bench.MAX_LEN), np.int32)),
    )

    variants = {
        "while": dict(),
        "scan": dict(early_exit=False),
        "unroll4": dict(unroll=4),
        "unroll8": dict(unroll=8),
        "full": dict(unroll=True),
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    results = {}
    ref_tokens = None
    for name, kw in variants.items():
        for hk in ((False,) if args.no_hk else (False, True)):
            tag = name + ("+hk" if hk else "")
            decode = jax.jit(
                functools.partial(
                    beam_search, model, beam_size=bench.BEAM, out_size=1,
                    compute_dtype=jnp.bfloat16, beam_resident=True,
                    head_kernel=hk, **kw,
                )
            )
            try:
                t_c0 = time.perf_counter()
                for _ in range(2):
                    outs, _ = decode(params, batch=one)
                    toks = np.asarray(outs)
                compile_s = time.perf_counter() - t_c0
            except Exception as e:
                results[tag] = {"error": str(e)[:120]}
                print(f"{tag:12s} ERROR {str(e)[:80]}", flush=True)
                continue
            if ref_tokens is None:
                ref_tokens = toks
            identical = bool(np.array_equal(toks, ref_tokens))
            reps = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    outs, _ = decode(params, batch=one)
                np.asarray(outs)
                reps.append((time.perf_counter() - t0) / args.iters)
            p50 = float(np.median(reps) * 1e3)
            best = float(np.min(reps) * 1e3)
            results[tag] = {
                "p50_pipelined_ms": round(p50, 3),
                "best_ms": round(best, 3),
                "compile_s": round(compile_s, 1),
                "tokens_identical": identical,
            }
            print(f"{tag:12s} p50={p50:7.3f} ms best={best:7.3f} ms "
                  f"compile={compile_s:5.1f}s identical={identical}",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
