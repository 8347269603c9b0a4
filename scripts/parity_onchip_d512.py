"""Reference-scale on-chip decode parity check (VERDICT r2 #5).

Transplants random-init weights from the actual torch reference
(StandardTransformerUsingRegion at d_model 512, 8 heads, 3+3 layers,
|V| 10k — reference models/base_transformer.py:45-53 is the decode loop
being matched) into the flax model, then on the REAL TPU:

  1. asserts greedy (beam-1) and beam-5 token parity in f32
     (jax_default_matmul_precision=highest — the parity mode), and
  2. reports (not asserts) the f32-vs-bf16 token agreement rate of the
     fast decode path (``compute_dtype=bfloat16`` — the BENCH mode).

The tiny-shape parity suite (tests/test_reference_parity.py, d16, CPU)
proves the algorithms match; this script covers the shapes where bf16/f32
accumulation and tie-breaking could actually diverge.

Beam-5 at random-init d512 is tie-fragile (measured: 10k-way logits give
candidate-boundary gaps below the ~3e-5/step f32 cross-backend noise, and
a flipped near-tie mid-search amplifies into different final sequences),
so exact beam token parity is only asserted in ``--f64`` mode — run

    JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python scripts/parity_onchip_d512.py --f64

where both stacks decode in float64 (noise ~1e-13 can no longer flip any
decision) and greedy AND beam-5 tokens must match exactly — the
algorithmic-parity-at-scale statement.  The default (f32, real chip) run
asserts greedy parity and score-equivalence diagnostics for beam-5.

Usage:  python scripts/parity_onchip_d512.py [--bs 16] [--regions 50] [--f64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
REFERENCE = "/root/reference"
sys.path.insert(0, ROOT)

import jax  # noqa: E402

if "--f64" in sys.argv:
    # the axon plugin overrides JAX_PLATFORMS, so force CPU via the config
    # (effective until the backend first initialises — i.e. here)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# parity mode: full-f32 MXU accumulation (the TPU default is bf16-ish
# passes, see .claude/skills/verify gotchas)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from openviic_tpu.builders import build_model  # noqa: E402
from openviic_tpu.compat.torch_import import convert_torch_state_dict  # noqa: E402
from openviic_tpu.config import ConfigNode  # noqa: E402
from openviic_tpu.decoding import beam_search  # noqa: E402


class FakeVocab:
    def __init__(self, n=10000, max_len=23):
        self.itos = ["<pad>", "<bos>", "<eos>", "<unk>"] + [
            f"w{i}" for i in range(n - 4)
        ]
        self.stoi = {t: i for i, t in enumerate(self.itos)}
        self.padding_idx, self.bos_idx, self.eos_idx, self.unk_idx = 0, 1, 2, 3
        self.max_caption_length = max_len
        self.word_embeddings = None

    def __len__(self):
        return len(self.itos)


def attention_config(d_model, head, d_ff, can_be_stateful=False):
    return {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": head,
        "D_MODEL": d_model,
        "D_KEY": d_model // head,
        "D_VALUE": d_model // head,
        "D_FF": d_ff,
        "D_FEATURE": d_ff,
        "USE_AOA": False,
        "CAN_BE_STATEFUL": can_be_stateful,
        "DROPOUT": 0.1,
    }


def model_config(d_model=512, head=8, d_ff=2048, layers=3, d_feature=1024):
    return ConfigNode(
        {
            "ARCHITECTURE": "StandardTransformerUsingRegion",
            "NAME": "parity_d512",
            "DEVICE": "cpu",  # torch reference instantiates torch.device(DEVICE); flax side ignores it
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": d_feature,
                "D_MODEL": d_model,
                "DROPOUT": 0.1,
            },
            "ENCODER": {
                "ARCHITECTURE": "Encoder",
                "D_MODEL": d_model,
                "LAYERS": layers,
                "TRIGNOMETRIC_EMBEDDING": True,
                "SELF_ATTENTION": attention_config(d_model, head, d_ff),
            },
            "DECODER": {
                "ARCHITECTURE": "Decoder",
                "D_MODEL": d_model,
                "LAYERS": layers,
                "ATTENTION": {
                    "D_MODEL": d_model,
                    "N_ENCODER_LAYERS": layers,
                    "SELF_ATTENTION": attention_config(
                        d_model, head, d_ff, can_be_stateful=True
                    ),
                    "ENC_ATTENTION": attention_config(d_model, head, d_ff),
                },
                "TEXT_EMBEDDING": {
                    "ARCHITECTURE": "UsualEmbedding",
                    "D_MODEL": d_model,
                    "D_EMBEDDING": None,
                    "WORD_EMBEDDING": None,
                    "WORD_EMBEDDING_CACHE": None,
                    "DROPOUT": 0.1,
                },
            },
        }
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--regions", type=int, default=50)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--f64", action="store_true",
                    help="float64 on CPU: assert EXACT beam-5 token parity")
    args = ap.parse_args()
    if args.f64:
        assert jax.config.jax_enable_x64
        assert jax.default_backend() == "cpu", jax.default_backend()

    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)

    log(f"devices: {jax.devices()}")
    vocab = FakeVocab(n=args.vocab)
    cfg = model_config()

    # --- torch reference model + decode (CPU) -------------------------------
    sys.path.insert(0, REFERENCE)
    import models as ref_models  # noqa: F401 — populates registries
    from builders.model_builder import META_ARCHITECTURE
    from utils.instance import Instance

    torch.manual_seed(0)
    ref_model = META_ARCHITECTURE.get("StandardTransformerUsingRegion")(
        cfg, vocab
    )
    ref_model.eval()
    if args.f64:
        ref_model.double()
    log(f"reference model built ({sum(p.numel() for p in ref_model.parameters())/1e6:.1f}M params)")

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(args.bs, args.regions, 1024)).astype(np.float32)
    t_feats = torch.tensor(feats.astype(np.float64) if args.f64 else feats)
    t_batch = Instance(region_features=t_feats)

    with torch.no_grad():
        t1 = time.time()
        ref_greedy, ref_greedy_lp = ref_model.beam_search(
            t_batch, batch_size=args.bs, beam_size=1, out_size=1
        )
        log(f"reference greedy decode done ({time.time()-t1:.1f}s)")
        t1 = time.time()
        ref_beam, ref_beam_lp = ref_model.beam_search(
            t_batch, batch_size=args.bs, beam_size=5, out_size=5
        )
        log(f"reference beam-5 decode done ({time.time()-t1:.1f}s)")

    # --- flax model on the TPU ----------------------------------------------
    model = build_model(cfg, vocab)
    batch = {"region_features": jnp.asarray(feats)}
    params = model.init(jax.random.PRNGKey(0), {
        "region_features": jnp.asarray(feats[:2]),
        "caption_tokens": jnp.zeros((2, vocab.max_caption_length), jnp.int32),
    })
    params, missing, unused = convert_torch_state_dict(
        ref_model.state_dict(), params
    )
    assert missing == [], f"params with no reference counterpart: {missing}"
    assert set(unused) <= {"decoder.pos_emb.weight"}, unused
    log("weights transplanted")

    if args.f64:
        # float64 on CPU: numeric noise (~1e-13) is far below any candidate
        # boundary gap, so BOTH greedy and beam-5 must match token-exactly —
        # this is the algorithmic-parity-at-scale assertion.
        dd = jnp.float64
        batch64 = {"region_features": jnp.asarray(feats, dd)}
        t1 = time.time()
        g64, _ = beam_search(
            model, params, batch64, beam_size=1, out_size=1, compute_dtype=dd
        )
        g64 = np.asarray(g64)
        log(f"f64 greedy done ({time.time()-t1:.1f}s incl. compile)")
        t1 = time.time()
        b64, b64_lp = beam_search(
            model, params, batch64, beam_size=5, out_size=5, compute_dtype=dd
        )
        b64 = np.asarray(b64)
        log(f"f64 beam-5 done ({time.time()-t1:.1f}s incl. compile)")
        g_eq = (g64 == ref_greedy.numpy()).mean()
        b_eq = (b64 == ref_beam.numpy()).mean()
        lp_d = float(np.max(np.abs(np.asarray(b64_lp) - ref_beam_lp.numpy())))
        log(f"f64 vs torch: greedy tokens {g_eq:.4%} equal, "
            f"beam-5 tokens {b_eq:.4%} equal, max |dlogp| {lp_d:.3e}")
        assert g_eq == 1.0, "greedy f64 token parity FAILED"
        assert b_eq == 1.0, "beam-5 f64 token parity FAILED"
        print(
            "PARITY_D512_F64 "
            f"{{\"greedy_f64_parity\": true, \"beam5_f64_parity\": true, "
            f"\"max_dlogp\": {lp_d:.3e}}}"
        )
        return

    # f32 parity path
    t1 = time.time()
    got_greedy, got_greedy_lp = beam_search(
        model, params, batch, beam_size=1, out_size=1
    )
    got_greedy = np.asarray(got_greedy)
    log(f"tpu f32 greedy done ({time.time()-t1:.1f}s incl. compile)")
    t1 = time.time()
    got_beam, got_beam_lp = beam_search(
        model, params, batch, beam_size=5, out_size=5
    )
    got_beam = np.asarray(got_beam)
    log(f"tpu f32 beam-5 done ({time.time()-t1:.1f}s incl. compile)")

    # --- assertions: f32 parity ---------------------------------------------
    # Greedy is argmax-robust: assert exact token equality.  Beam-5 at
    # RANDOM-INIT d512 is tie-fragile — the 10k-way logits are near-uniform,
    # so candidate scores are degenerate at the f32 noise floor and the two
    # searches may legitimately keep different near-tied beams.  The
    # meaningful parity statement is SCORE equivalence: rescoring both beam
    # sets under the SAME scorer (the torch reference, teacher-forced — the
    # reference's own accumulation rule: sum of token log-probs through the
    # first <eos>, models/modules/beam_search.py:50-57) must give rank-wise
    # identical score profiles up to f32 cross-backend noise.
    greedy_eq = got_greedy == ref_greedy.numpy()
    row_eq = (got_beam == ref_beam.numpy()).all(axis=-1)
    log(
        f"f32 vs torch: greedy tokens {greedy_eq.mean():.4%} equal, "
        f"beam-5 rows {row_eq.mean():.4%} identical"
    )
    assert greedy_eq.all(), "greedy f32 token parity FAILED"

    def torch_rescore(seqs):
        """Total log-prob of each (bs, k, L) sequence under the torch model."""
        bs, k, L = seqs.shape
        flat = seqs.reshape(bs * k, L).astype(np.int64)
        inp = np.concatenate(
            [np.full((bs * k, 1), vocab.bos_idx, np.int64), flat[:, :-1]], 1
        )
        rep = np.repeat(feats, k, axis=0)
        with torch.no_grad():
            out = ref_model(
                Instance(
                    region_features=torch.tensor(rep),
                    caption_tokens=torch.tensor(inp),
                )
            )
        lp = (
            out.gather(-1, torch.tensor(flat).unsqueeze(-1))
            .squeeze(-1)
            .numpy()
        )
        # accumulate through the first <eos> (inclusive), like the beam
        fin = np.cumsum(flat == vocab.eos_idx, axis=1)
        live = np.concatenate(
            [np.ones((bs * k, 1), bool), fin[:, :-1] == 0], axis=1
        )
        return (lp * live).sum(axis=1).reshape(bs, k)

    ref_scores = torch_rescore(ref_beam.numpy())
    got_scores = torch_rescore(got_beam)
    # noise floor: repo-accumulated total vs torch rescore of the SAME seqs
    got_lp_np = np.asarray(got_beam_lp)
    fin = np.cumsum(got_beam == vocab.eos_idx, axis=-1)
    live = np.concatenate(
        [np.ones(got_beam.shape[:2] + (1,), bool), fin[..., :-1] == 0], axis=-1
    )
    repo_totals = (got_lp_np * live).sum(axis=-1)
    noise = float(np.max(np.abs(repo_totals - got_scores)))
    # rank-wise score equivalence (each search's r-th best is equally good)
    rank_gap = float(np.max(np.abs(ref_scores - got_scores)))
    log(
        f"beam-5 f32 score equivalence: rank-wise |d score| max {rank_gap:.3e} "
        f"(cross-backend scoring noise on identical seqs: {noise:.3e})"
    )
    # A near-tie flipped mid-search amplifies (the excluded candidate's
    # continuation drifts), so the END-state gap bound is loose — the exact
    # decision-level parity statement is the --f64 run's job.  Measured
    # 2026-08-17 on the real chip: rows 93.75% identical, rank gap 2.9e-2,
    # noise floor 6.3e-4.
    assert row_eq.mean() >= 0.85, (
        f"beam-5 f32 row identity {row_eq.mean():.2%} — too low for "
        "tie-flip divergence; suspect a real algorithmic difference"
    )
    assert rank_gap < 0.1, (
        f"beam-5 f32 rank gap {rank_gap:.3e} exceeds the tie-amplification "
        "bound; suspect a real algorithmic difference"
    )

    # --- report: bf16 fast path agreement ------------------------------------
    t1 = time.time()
    bf_greedy, _ = beam_search(
        model, params, batch, beam_size=1, out_size=1,
        compute_dtype=jnp.bfloat16,
    )
    bf_beam, _ = beam_search(
        model, params, batch, beam_size=5, out_size=5,
        compute_dtype=jnp.bfloat16,
    )
    bf_greedy, bf_beam = np.asarray(bf_greedy), np.asarray(bf_beam)
    log(f"tpu bf16 decode done ({time.time()-t1:.1f}s incl. compile)")
    g_rate = float((bf_greedy == got_greedy).mean())
    b_rate = float((bf_beam == got_beam).mean())
    # sequence-level: all tokens of the top beam equal
    g_seq = float((bf_greedy == got_greedy).all(axis=-1).mean())
    top_f32 = got_beam[:, 0]
    top_bf = bf_beam[:, 0]
    b_seq = float((top_bf == top_f32).all(axis=-1).mean())
    log(
        f"bf16 vs f32 (REPORT): greedy token agreement {g_rate:.4%} "
        f"(sequences {g_seq:.2%}), beam-5 token agreement {b_rate:.4%} "
        f"(top-beam sequences {b_seq:.2%})"
    )
    print(
        "PARITY_ONCHIP_D512 "
        f"{{\"greedy_f32_parity\": true, "
        f"\"beam5_row_identity\": {row_eq.mean():.6f}, "
        f"\"beam5_rank_score_gap\": {rank_gap:.3e}, "
        f"\"scoring_noise_floor\": {noise:.3e}, "
        f"\"bf16_greedy_token_agreement\": {g_rate:.6f}, "
        f"\"bf16_beam5_token_agreement\": {b_rate:.6f}, "
        f"\"bf16_greedy_seq_agreement\": {g_seq:.6f}, "
        f"\"bf16_beam5_topseq_agreement\": {b_seq:.6f}}}"
    )


if __name__ == "__main__":
    main()
