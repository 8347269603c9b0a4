"""Cross-batch pipelined decode experiment (VERDICT r2 item #2).

The beam-5 decode step is per-op-overhead-bound (PERF.md "Remaining gap
analysis": ~540 us/step critical path of ~100 small fusions vs ~120 us
analytic HBM floor).  Two levers are measured here, both overlapping
independent decode batches so one batch's bubbles hide under another's
compute:

  (a) async dispatch depth-2: dispatch batch i+1's jitted call before
      blocking on batch i-1 (host-side overlap; the TPU itself executes
      one XLA program at a time, so this can only hide host dispatch).
  (b) fused dual/tri-stream program (``beam_search_multi``): N independent
      batches decoded inside ONE ``lax.while_loop`` — every loop body step
      contains both streams' op graphs with no cross-dependencies, so
      XLA's latency-hiding scheduler can interleave them and fill the
      per-fusion bubbles on-device.

Reference mechanics being beaten: models/modules/beam_search.py:94-118
(one python-loop decode per batch, no overlap of any kind).

Run on the real chip:  python scripts/bench_pipelined_decode.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEAM = 5
VOCAB_SIZE = 10_000
MAX_LEN = 25
N_REGIONS = 50
D_FEATURE = 1024
D_MODEL = 512
HEADS = 8
LAYERS = 3
D_FF = 2048


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search
    from openviic_tpu.decoding.beam_search import beam_search_multi

    vocab = _tiny_vocab(size=VOCAB_SIZE, max_len=MAX_LEN)
    config = _model_config(D_MODEL, HEADS, LAYERS, D_FF, D_FEATURE)
    model = build_model(config, vocab)

    def mk_batch(bs, seed):
        b = _make_batch(
            vocab, bs=bs, n_regions=N_REGIONS, d_feature=D_FEATURE, seed=seed
        )
        return {"region_features": jax.device_put(b["region_features"])}

    init_batch = mk_batch(96, 0)
    params = model.init(
        jax.random.PRNGKey(0),
        dict(
            init_batch,
            caption_tokens=np.zeros((96, MAX_LEN), np.int32),
        ),
    )

    def jit_single():
        return jax.jit(
            functools.partial(
                beam_search, model, beam_size=BEAM, out_size=1,
                compute_dtype=jnp.bfloat16, beam_resident=True,
            )
        )

    def jit_multi(n):
        return jax.jit(
            lambda p, bs: beam_search_multi(
                model, p, bs, beam_size=BEAM, out_size=1,
                compute_dtype=jnp.bfloat16,
            )
        )

    results = {}
    N_ITERS = 10

    def report(name, captions, dt):
        tput = captions / dt
        results[name] = round(tput, 1)
        print(f"{name:34s} {tput:9.1f} captions/s  ({dt*1e3/N_ITERS:7.2f} ms/iter)")

    def run(name, fn, batches, captions_per_iter, block_each=False, depth=None):
        """Steady-state timing: dispatch all iters, sync once at the end
        (matches bench.py and the eval/serving loops, which keep the
        dispatch pipe full).  block_each=True instead pays the full axon
        tunnel round-trip per call — reported only to quantify that cost.
        depth=k syncs when more than k results are in flight.

        Sync is np.asarray, NOT .block_until_ready(): on the axon tunnel
        block_until_ready can return before the remote computation has
        actually run (bench.py warmup comment; verified again here —
        dispatch-only + block measured 0.08 ms/iter for a 26 ms program)."""
        for _ in range(2):
            out = fn(batches[0])
            np.asarray(jax.tree.leaves(out)[0])
        pending = []
        t0 = time.perf_counter()
        for i in range(N_ITERS):
            out = fn(batches[i % len(batches)])
            leaf = jax.tree.leaves(out)[0]
            if block_each:
                np.asarray(leaf)
            elif depth is not None:
                pending.append(leaf)
                if len(pending) > depth:
                    np.asarray(pending.pop(0))
        for p in pending:
            np.asarray(p)
        if not block_each and depth is None:
            np.asarray(leaf)
        report(name, captions_per_iter * N_ITERS, time.perf_counter() - t0)

    decode = jit_single()
    decode2 = jit_multi(2)
    decode3 = jit_multi(3)
    b96 = [mk_batch(96, s) for s in range(4)]
    b48 = [mk_batch(48, 10 + s) for s in range(4)]
    b192 = [mk_batch(192, 20 + s) for s in range(2)]
    single = lambda b: decode(params, batch=b)[0]
    multi2 = lambda pair: decode2(params, pair)
    multi3 = lambda tri: decode3(params, tri)

    run("A single-96 steady", single, b96, 96)
    run("A2 single-96 block-each", single, b96, 96, block_each=True)
    run("B single-96 depth2", single, b96, 96, depth=2)
    run("C fused 2x96 steady", multi2, [(b96[0], b96[1]), (b96[2], b96[3])], 192)
    run("D fused 2x48 steady", multi2, [(b48[0], b48[1]), (b48[2], b48[3])], 96)
    run("E fused 3x96 steady", multi3,
        [(b96[0], b96[1], b96[2]), (b96[3], b96[0], b96[1])], 288)
    run("F single-192 steady", single, b192, 192)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
