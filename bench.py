"""Benchmark: captions/sec/chip at beam=5 on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The model is StandardTransformerUsingRegion at reference scale (d_model
512, 8 heads, 3+3 layers, 1024-d region features — the shapes of
configs/standard_transformer_using_region.yaml), vocab 10k, max length 25,
50 regions/image.

``vs_baseline`` is measured live against a faithful torch-CPU re-creation
of the reference's decode mechanics (per-step Python loop, stateful raw-KV
concatenation with full re-projection each step, gather-based beam
reordering — models/modules/{attentions,beam_search,containers}.py
semantics).  The reference repo targets a single GPU; no GPU exists here,
so the baseline row is its CPU throughput, as BASELINE.md requires numbers
to be measured rather than assumed.  Extra keys document both sides.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BEAM = 5
VOCAB_SIZE = 10_000
MAX_LEN = 25
N_REGIONS = 50
D_FEATURE = 1024
D_MODEL = 512
HEADS = 8
LAYERS = 3
D_FF = 2048

JAX_BATCH = 320  # images per decode batch on TPU (throughput peak — the
# round-3 batch-scaling re-scan in PERF.md: 96/192/320 -> 3.7k/4.0k/4.45k
# captions/s, peak at 320; >=512 crashes the axon TPU worker.  With the
# fused head+top-k kernel: 96/192/320/384 -> 4.2k/4.9k/5.3k/5.4k)
TORCH_BATCH = 12  # reference DICT_BATCH_SIZE 60 // beam 5 (base_trainer.py:65)


def bench_jax() -> tuple:
    import jax

    from __graft_entry__ import _make_batch, _model_config, _tiny_vocab
    from openviic_tpu.builders import build_model
    from openviic_tpu.decoding import beam_search

    vocab = _tiny_vocab(size=VOCAB_SIZE, max_len=MAX_LEN)
    config = _model_config(D_MODEL, HEADS, LAYERS, D_FF, D_FEATURE)
    model = build_model(config, vocab)
    batch = _make_batch(vocab, bs=JAX_BATCH, n_regions=N_REGIONS, d_feature=D_FEATURE)
    batch = {"region_features": batch["region_features"]}
    params = model.init(
        jax.random.PRNGKey(0),
        dict(
            batch,
            caption_tokens=np.zeros((JAX_BATCH, MAX_LEN), np.int32),
        ),
    )

    import jax.numpy as jnp

    decode = jax.jit(
        functools.partial(
            beam_search, model, beam_size=BEAM, out_size=1,
            compute_dtype=jnp.bfloat16,
            # beam-resident decode: no cache gathers, dedup cross K/V,
            # fused hierarchical selection — token-identical to the default
            # path (tests/test_beam_search_variants.py); plus the fused
            # vocab-head+lse+top-k Pallas kernel (+20% at this batch,
            # 100% token-identical on the trained checkpoint — PERF.md
            # round 3)
            beam_resident=True, head_kernel=True,
        )
    )
    # warm up twice, materializing on host — on the axon tunnel the first
    # block_until_ready can return before remote compilation has finished
    for _ in range(2):
        outs, _ = decode(params, batch=batch)
        np.asarray(outs)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        outs, _ = decode(params, batch=batch)
    np.asarray(outs)
    dt = time.perf_counter() - t0
    throughput = JAX_BATCH * n_iters / dt

    # p50 per-image latency: single-image decode (BASELINE.md north-star
    # row).  Timed as K back-to-back async dispatches with ONE final D2H
    # sync, divided by K: TPU programs execute in order, so this bounds the
    # per-call device execution time from above while excluding the
    # tunnel's ~2-3 ms per-call round-trip tax (not representative of a
    # co-located host).  Per-call block_until_ready is NOT usable here: on
    # the current axon tunnel it returns without a device round-trip (a
    # full bs=1 decode "finished" in 0.1 ms that way — see
    # scripts/bench_latency.py for the methodology study and the
    # wall-including-tunnel numbers).
    # single-image program: below the head kernel's win region (5 rows),
    # so the latency row uses the XLA fast-select path (the same choice
    # BeamSearcher's auto-gate makes)
    decode = jax.jit(
        functools.partial(
            beam_search, model, beam_size=BEAM, out_size=1,
            compute_dtype=jnp.bfloat16, beam_resident=True,
        )
    )
    one = {"region_features": batch["region_features"][:1]}
    for _ in range(2):
        np.asarray(decode(params, batch=one)[0])
    K = 30
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            outs, _ = decode(params, batch=one)
        np.asarray(outs)
        reps.append((time.perf_counter() - t0) / K)
    p50_pipelined_ms = float(np.median(reps) * 1e3)

    # wall p50: one D2H materialisation per call — includes the tunnel's
    # per-call round-trip tax, so it IS comparable to the round-1/2
    # numbers (the r3 methodology switch made p50 look 13x faster;
    # emitting both keeps BENCH_r0N.json deltas meaningful — VERDICT r3
    # weak #7 / next #9)
    walls = []
    for _ in range(20):
        t0 = time.perf_counter()
        outs, _ = decode(params, batch=one)
        np.asarray(outs)
        walls.append(time.perf_counter() - t0)
    p50_wall_ms = float(np.median(walls) * 1e3)
    return throughput, p50_pipelined_ms, p50_wall_ms


def bench_trained() -> dict:
    """Decode the TRAINED d512 checkpoint on its held-out test split.

    Artifact produced by scripts/export_trained_bench.py (reference-scale
    XE+SCST training on the realistic-language benchmark; the PERF.md
    round-5 side-by-side trains the torch reference on the same data).
    Returns trained-decode throughput + the test CIDEr the decoded
    captions actually score, so the headline row is backed by a real
    model on a non-saturating task, not random init."""
    import os

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "saved_models")
    # round 5: the trained row comes from the realistic-language
    # benchmark artifact (hard task: Zipf vocab ~7k, 21.7-token captions,
    # ~5 refs/image, oracle ceiling < 1 — see realistic_dataset/stats
    # in the artifact meta); the saturated vocab-51 signal artifact is
    # retired as a fallback only
    art = os.path.join(base, "realistic_d512_bench")
    if not os.path.isdir(art):
        art = os.path.join(base, "signal_d512_bench")
    if not os.path.isdir(art):
        return {}

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from trained_artifact import load_trained_artifact

    from openviic_tpu.decoding import beam_search
    from openviic_tpu.evaluation import Cider

    loaded = load_trained_artifact("/tmp/bench_trained")
    model, params, vocab = loaded["model"], loaded["params"], loaded["vocab"]
    feats, ids, refs = loaded["feats"], loaded["ids"], loaded["refs"]

    n = feats.shape[0]
    batch = {"region_features": jax.device_put(feats)}
    decode = functools.partial(
        beam_search, model, beam_size=BEAM, out_size=1,
        compute_dtype=jnp.bfloat16, beam_resident=True, head_kernel=True,
    )
    decode = jax.jit(decode)
    for _ in range(2):
        outs, _ = decode(params, batch=batch)
        np.asarray(outs)
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        outs, _ = decode(params, batch=batch)
    tokens = np.asarray(outs)
    dt = time.perf_counter() - t0
    throughput = n * n_iters / dt

    import itertools

    caps = vocab.decode_caption(tokens.reshape(n, -1), join_words=False)
    gens = {
        i: [" ".join(k for k, _ in itertools.groupby(c))]
        for i, c in zip(ids, caps)
    }
    gts = {i: refs[i] for i in ids}
    cider = float(Cider().compute_score(gts, gens)[0])
    return {
        "trained_captions_per_sec": round(throughput, 2),
        "trained_test_cider": round(cider, 4),
        "trained_n_images": n,
    }


def bench_torch_reference() -> float:
    """Reference-mechanics beam-5 decode on torch CPU."""
    import torch

    torch.manual_seed(0)
    d_k = D_MODEL // HEADS

    class MHA(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.q = torch.nn.Linear(D_MODEL, D_MODEL)
            self.k = torch.nn.Linear(D_MODEL, D_MODEL)
            self.v = torch.nn.Linear(D_MODEL, D_MODEL)
            self.o = torch.nn.Linear(D_MODEL, D_MODEL)
            self.ln = torch.nn.LayerNorm(D_MODEL)

        def forward(self, q_in, kv):
            bs, nq = q_in.shape[:2]
            nk = kv.shape[1]
            q = self.q(q_in).view(bs, nq, HEADS, d_k).permute(0, 2, 1, 3)
            k = self.k(kv).view(bs, nk, HEADS, d_k).permute(0, 2, 3, 1)
            v = self.v(kv).view(bs, nk, HEADS, d_k).permute(0, 2, 1, 3)
            att = torch.softmax(q @ k / np.sqrt(d_k), -1)
            out = (att @ v).permute(0, 2, 1, 3).reshape(bs, nq, D_MODEL)
            return self.ln(q_in + self.o(out))

    class Layer(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = MHA()
            self.cross = MHA()
            self.ff1 = torch.nn.Linear(D_MODEL, D_FF)
            self.ff2 = torch.nn.Linear(D_FF, D_MODEL)
            self.ln = torch.nn.LayerNorm(D_MODEL)

        def forward(self, x, self_kv, memory):
            x = self.self_attn(x, self_kv)
            x = self.cross(x, memory)
            return self.ln(x + self.ff2(torch.relu(self.ff1(x))))

    class RefDecoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = torch.nn.Embedding(VOCAB_SIZE, D_MODEL)
            self.layers = torch.nn.ModuleList([Layer() for _ in range(LAYERS)])
            self.fc = torch.nn.Linear(D_MODEL, VOCAB_SIZE, bias=False)
            self.enc = torch.nn.ModuleList([MHA() for _ in range(LAYERS)])
            self.vis = torch.nn.Linear(D_FEATURE, D_MODEL)

    model = RefDecoder().eval()

    features = torch.randn(TORCH_BATCH, N_REGIONS, D_FEATURE)

    @torch.no_grad()
    def decode_batch():
        # encoder
        mem = model.vis(features)
        for enc in model.enc:
            mem = enc(mem, mem)
        bs = TORCH_BATCH
        # beam state: raw (pre-projection) token inputs accumulated per layer,
        # reprojected in full each step — the reference's stateful cache
        # mechanics (attentions.py:297-302)
        mem_b = mem.repeat_interleave(1, 0)
        seq_logprob = torch.zeros(bs, 1, 1)
        selected = torch.full((bs * 1, 1), 1, dtype=torch.long)
        running = [torch.zeros(bs, 0, D_MODEL) for _ in model.layers]
        cur_beam = 1
        outputs = []
        for t in range(MAX_LEN):
            x = model.emb(selected)
            new_running = []
            for li, layer in enumerate(model.layers):
                kv = torch.cat([running[li], x], 1)
                new_running.append(kv)
                x = layer(x, kv, mem_b)
            logprob = torch.log_softmax(model.fc(x), -1).view(bs, cur_beam, -1)
            cand = seq_logprob + logprob
            sel_lp, sel_idx = torch.sort(cand.view(bs, -1), -1, descending=True)
            sel_lp, sel_idx = sel_lp[:, :BEAM], sel_idx[:, :BEAM]
            beam = sel_idx // VOCAB_SIZE
            words = sel_idx % VOCAB_SIZE
            # gather-reorder every cached tensor (containers.py:27-32)
            def expand_state(s):
                shape = list(s.shape)
                s = s.view(bs, cur_beam, *shape[1:])
                idx = beam.view(bs, BEAM, *([1] * (len(shape) - 1))).expand(
                    bs, BEAM, *shape[1:]
                )
                return torch.gather(s, 1, idx).reshape(bs * BEAM, *shape[1:])

            if cur_beam == 1:
                running = [r.repeat_interleave(1, 0) for r in new_running]
                running = [
                    r.view(bs, 1, *r.shape[1:])
                    .expand(bs, BEAM, *r.shape[1:])
                    .reshape(bs * BEAM, *r.shape[1:])
                    for r in new_running
                ]
                mem_b = (
                    mem.view(bs, 1, *mem.shape[1:])
                    .expand(bs, BEAM, *mem.shape[1:])
                    .reshape(bs * BEAM, *mem.shape[1:])
                )
            else:
                running = [expand_state(r) for r in new_running]
            seq_logprob = sel_lp.unsqueeze(-1)
            selected = words.view(-1, 1)
            outputs.append(words)
            cur_beam = BEAM
        return torch.stack(outputs, -1)

    decode_batch()  # warmup
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        decode_batch()
    dt = time.perf_counter() - t0
    return TORCH_BATCH * n_iters / dt


def main() -> None:
    value, p50_ms, p50_wall_ms = bench_jax()
    try:
        trained = bench_trained()
    except Exception as e:  # missing artifact must not kill the bench
        print(f"trained-checkpoint bench failed: {e}", file=sys.stderr)
        trained = {}
    try:
        baseline = bench_torch_reference()
    except Exception as e:  # torch missing/broken should not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = None

    result = {
        "metric": "captions_per_sec_per_chip_beam5",
        "value": round(value, 2),
        "unit": "captions/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "baseline_captions_per_sec": round(baseline, 2) if baseline else None,
        "baseline_hw": "torch-cpu reference-mechanics decode (no GPU available)",
        "p50_per_image_latency_ms": round(p50_ms, 2),
        "p50_pipelined_ms": round(p50_ms, 2),
        "p50_wall_ms": round(p50_wall_ms, 2),
        "decode_dtype": "bfloat16", "config": {
            "beam": BEAM, "vocab": VOCAB_SIZE, "max_len": MAX_LEN,
            "batch": JAX_BATCH, "d_model": D_MODEL, "layers": LAYERS,
        },
        **trained,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
