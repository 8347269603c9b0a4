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

Usage:  python scripts/parity_onchip_d512.py [--bs 16] [--regions 50]
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
            "DEVICE": "tpu",
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
    args = ap.parse_args()

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
    log(f"reference model built ({sum(p.numel() for p in ref_model.parameters())/1e6:.1f}M params)")

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(args.bs, args.regions, 1024)).astype(np.float32)
    t_batch = Instance(region_features=torch.tensor(feats))

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

    # --- assertions: f32 token parity ---------------------------------------
    greedy_eq = got_greedy == ref_greedy.numpy()
    beam_eq = got_beam == ref_beam.numpy()
    lp_d = float(np.max(np.abs(np.asarray(got_beam_lp) - ref_beam_lp.numpy())))
    log(
        f"f32 vs torch: greedy tokens {greedy_eq.mean():.4%} equal, "
        f"beam-5 tokens {beam_eq.mean():.4%} equal, "
        f"max |dlogp| {lp_d:.3e}"
    )
    assert greedy_eq.all(), "greedy f32 token parity FAILED"
    assert beam_eq.all(), "beam-5 f32 token parity FAILED"

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
        f"{{\"greedy_f32_parity\": true, \"beam5_f32_parity\": true, "
        f"\"max_dlogp\": {lp_d:.3e}, "
        f"\"bf16_greedy_token_agreement\": {g_rate:.6f}, "
        f"\"bf16_beam5_token_agreement\": {b_rate:.6f}, "
        f"\"bf16_greedy_seq_agreement\": {g_seq:.6f}, "
        f"\"bf16_beam5_topseq_agreement\": {b_seq:.6f}}}"
    )


if __name__ == "__main__":
    main()
