"""Per-image decode latency at small batch (the BASELINE.md tracked metric).

BASELINE.md's north-star table tracks "p50 per-image decode latency" next
to throughput; this script measures it in the latency regime the
throughput bench never visits: batch 1/4/8/16 at beam 5 and beam 3, on
the flagship reference-scale model (StandardTransformerUsingRegion,
d 512, vocab 10k — the shapes of bench.py), beam-resident bf16 path.

Each decode is ONE jitted XLA program (compile cached per batch shape).
Two timings per shape, syncing with a real D2H materialisation
(``np.asarray``) because on the axon tunnel ``block_until_ready`` returns
without a device round-trip (measured: a full bs=1 decode "completed" in
0.11 ms wall that way):

 - **wall**: sequential calls, one D2H sync each — what a remote client
   of this tunnel actually observes (includes ~2-3 ms round-trip tax);
 - **pipelined**: 20 back-to-back calls dispatched async, one sync at the
   end, divided by 20.  TPU programs execute in order, so this bounds the
   per-call device execution time from above — the deployable latency on
   a locally attached chip.

The tunnel round-trip floor (trivial jitted op, same sync) is printed for
reference.

Worst-case caveat: random-init weights rarely emit <eos>, so the
while_loop runs all MAX_LEN steps — full-length (worst-case) latencies,
consistent with bench.py.  --trained loads the committed d512 checkpoint
(saved_models/signal_d512_bench) whose captions finish early, so the
early-exit while_loop shows realistic lengths.

Usage: python scripts/bench_latency.py [--trained] [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

import bench


def _percentiles(samples):
    s = np.asarray(samples) * 1e3  # ms
    return float(np.percentile(s, 50)), float(np.percentile(s, 99))


def _load_trained():
    """(model, params, vocab, feats) from the committed bench artifact."""
    from trained_artifact import load_trained_artifact

    loaded = load_trained_artifact("/tmp/bench_latency")
    return loaded["model"], loaded["params"], loaded["vocab"], loaded["feats"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trained", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding.beam_search import BeamSearcher

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    # tunnel round-trip floor: a trivial jitted program, synced via D2H
    trivial = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8, 8))
    np.asarray(trivial(x0))
    floor = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        np.asarray(trivial(x0))
        floor.append(time.perf_counter() - t0)
    f50, f99 = _percentiles(floor)
    print(f"tunnel round-trip floor: p50 {f50:.2f} ms  p99 {f99:.2f} ms")

    if args.trained:
        model, params, vocab, all_feats = _load_trained()
    else:
        vocab = _tiny_vocab(size=bench.VOCAB_SIZE, max_len=bench.MAX_LEN)
        config = _model_config(bench.D_MODEL, bench.HEADS, bench.LAYERS,
                               bench.D_FF, bench.D_FEATURE)
        model = build_model(config, vocab)
        b0 = _make_batch(vocab, bs=1, n_regions=bench.N_REGIONS,
                         d_feature=bench.D_FEATURE)
        params = model.init(
            jax.random.PRNGKey(0),
            dict(
                region_features=b0["region_features"],
                caption_tokens=np.zeros((1, bench.MAX_LEN), np.int32),
            ),
        )
        all_feats = None

    searcher = BeamSearcher(model, compute_dtype=jnp.bfloat16,
                            beam_resident=True, head_kernel=True)

    rows = []
    for bs in (1, 4, 8, 16):
        if all_feats is not None:
            feats = {"region_features": jnp.asarray(all_feats[:bs])}
        else:
            batch = _make_batch(vocab, bs=bs, n_regions=bench.N_REGIONS,
                                d_feature=bench.D_FEATURE)
            feats = {"region_features": batch["region_features"]}
        for beam in (5, 3):
            out, _ = searcher(params, feats, beam_size=beam)  # compile+warm
            np.asarray(out)
            samples = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out, _ = searcher(params, feats, beam_size=beam)
                np.asarray(out)
                samples.append(time.perf_counter() - t0)
            p50, p99 = _percentiles(samples)
            # pipelined: K dependent-free async dispatches, one sync —
            # in-order execution bounds per-call device time from above
            K = 20
            t0 = time.perf_counter()
            for _ in range(K):
                out, _ = searcher(params, feats, beam_size=beam)
            np.asarray(out)
            piped = (time.perf_counter() - t0) / K * 1e3
            rows.append((bs, beam, p50, p99, piped, piped / bs))
            print(f"bs={bs:2d} beam={beam}  wall p50 {p50:7.2f} ms  "
                  f"p99 {p99:7.2f} ms  pipelined {piped:7.2f} ms  "
                  f"per-image {piped / bs:6.2f} ms", flush=True)

    print("\n| batch | beam | wall p50 ms | wall p99 ms | pipelined ms |"
          " per-image ms |")
    print("|---|---|---|---|---|---|")
    for bs, beam, p50, p99, piped, per in rows:
        print(f"| {bs} | {beam} | {p50:.2f} | {p99:.2f} | {piped:.2f} |"
              f" {per:.2f} |")


if __name__ == "__main__":
    main()
