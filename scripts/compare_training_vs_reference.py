"""Train the ACTUAL reference (torch, CPU) and this repo side by side.

Runs both trainers on the same tiny synthetic dataset (tiny_dataset/),
with the same model shape, LR schedule and epoch count, and reports per-
epoch train/val XE loss plus final beam-decode CIDEr on the dev split —
the toy-scale convergence comparison for PERF.md (reference:
trainers/vi_trainer.py:100-119 XE loop, :160-227 outer loop).

The reference's ``evaluate_metrics`` is not used because its
``compute_scores`` constructs the METEOR jar wrapper (downloads at first
use — offline here); CIDEr is computed directly with the reference's own
``evaluation.Cider`` on its own beam-search outputs.

Usage: python scripts/compare_training_vs_reference.py [--epochs 10]

Round-3 addition — reference-scale qualification (VERDICT r2 missing #1):

  # 1k-image signal dataset, d_model 512 / 8 heads / 3+3 layers (the
  # shapes of configs/standard_transformer_using_region.yaml)
  python scripts/make_tiny_dataset.py signal_dataset --n-images 1000 \
      --signal --no-grids
  python scripts/compare_training_vs_reference.py --root signal_dataset \
      --d-model 512 --heads 8 --layers 3 --d-ff 2048 --batch 60 \
      --dict-batch 60 --warmup 1000 --epochs 12 --only ref \
      --out /tmp/ref_d512.json          # torch CPU, run in background
  python scripts/compare_training_vs_reference.py ... --only repo --rbg \
      --out /tmp/repo_d512.json         # this repo, on the TPU

Both halves share the identical vocab/config/epoch budget; compare the
"cider" fields of the two JSONs (PERF.md "reference-scale comparison").
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def shared_config(root: str, ckpt: str, name: str, *, d_model: int = 64,
                  heads: int = 4, layers: int = 2, d_ff: int = 128,
                  batch: int = 8, dict_batch: int = 6, warmup: int = 100,
                  beam: int = 3, rbg: bool = False, bf16: bool = False,
                  arch: str = "standard", memory: int = 8,
                  trainer: str = "viTrainer"):
    from openviic_tpu.config import ConfigNode

    d_head = d_model // heads
    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": heads, "D_MODEL": d_model, "D_KEY": d_head,
        "D_VALUE": d_head,
        "D_FF": d_ff, "D_FEATURE": 128, "MEMORY": memory,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.1,
    }
    attn_stateful = dict(attn, CAN_BE_STATEFUL=True)
    # second/third-architecture qualification (VERDICT r2 missing #1 asked
    # for reference-scale trained parity; standard covered it in round 3 —
    # m2 exercises memory-augmented attention + multilevel/meshed decoding,
    # ort exercises the geometry-bias path, reference configs
    # meshed_memory_transformer.yaml / object_relation_transformer.yaml)
    arch_map = {
        "standard": ("StandardTransformerUsingRegion", "Encoder",
                     "ScaledDotProductAttention", "Decoder"),
        "m2": ("MeshedMemoryTransformer", "MultilevelEncoder",
               "AugmentedMemoryScaledDotProductAttention", "MeshedDecoder"),
        "ort": ("ObjectRelationTransformer", "GeometricEncoder",
                "AugmentedGeometryScaledDotProductAttention", "Decoder"),
        # round-4 qualification extensions (VERDICT r3 next #1): aoa =
        # the AoA-gating family (configs/attention_on_attention.yaml —
        # StandardTransformerUsingRegion with USE_AOA in every MHA),
        # camo = the cross-layer-fusion family
        # (configs/camo_transformer.yaml, encoders.py:214-248)
        "aoa": ("StandardTransformerUsingRegion", "Encoder",
                "ScaledDotProductAttention", "Decoder"),
        "camo": ("CamoTransformer", "CrossAttentionMultiLevelEncoder",
                 "ScaledDotProductAttention", "Decoder"),
        # round-5 (VERDICT r4 next #4): the one architecture family with
        # only a solo demo — reference DualCollaborativeLevelEncoder +
        # GeometricDualFeatureEmbedding (encoders.py:114-211,
        # vision_embeddings.py:45-70), wired manually on the torch side
        # since no reference config/architecture composes them (the ORT
        # shim precedent).  Dataset must carry grid features
        # (make_realistic_dataset.py --grids).
        "dlct": ("DLCTTransformer", "DualCollaborativeLevelEncoder",
                 "AugmentedGeometryScaledDotProductAttention", "Decoder"),
    }
    model_arch, enc_arch, enc_attn_arch, dec_arch = arch_map[arch]
    if arch == "aoa":
        attn = dict(attn, USE_AOA=True)
        attn_stateful = dict(attn_stateful, USE_AOA=True)
    enc_attn = dict(attn, ARCHITECTURE=enc_attn_arch)
    vision_embedding = {
        "ARCHITECTURE": "FeatureEmbedding",
        "D_FEATURE": 1024, "D_MODEL": d_model, "DROPOUT": 0.1,
    }
    encoder_extra = {}
    if arch == "dlct":
        vision_embedding = {
            "ARCHITECTURE": "GeometricDualFeatureEmbedding",
            "D_REGION_FEATURE": 1024, "D_GRID_FEATURE": 1024,
            "D_MODEL": d_model, "DROPOUT": 0.1,
        }
        encoder_extra = {
            "HEAD": heads,
            "CROSS_ATTENTION": dict(enc_attn),
        }
    return ConfigNode(
        {
            "TRAINER": trainer,
            "DATASET": {
                "FEATURE_BATCH_SIZE": batch,
                "DICT_BATCH_SIZE": dict_batch,
                "WORKERS": 0,
                "MIN_FREQ": 1,
                "VOCAB": {
                    "TOKENIZER": None, "WORD_EMBEDDING": None,
                    "WORD_EMBEDDING_CACHE": None,
                    "BOS_TOKEN": "<bos>", "EOS_TOKEN": "<eos>",
                    "PAD_TOKEN": "<pad>", "UNK_TOKEN": "<unk>",
                    "USE_MAPPING": False, "PRETRAINED_LANGUAGE_MODEL": None,
                },
                "JSON_PATH": {
                    "TRAIN": f"{root}/train.json",
                    "DEV": f"{root}/dev.json",
                    "TEST": f"{root}/test.json",
                },
                "FEATURE_PATH": {
                    "FEATURES": f"{root}/features",
                    "SCENE_TEXT": None, "IMAGE": None,
                },
            },
            "TRAINING": {
                "CHECKPOINT_PATH": ckpt,
                "LEARNING_RATE": 1.0,
                "RL_LEARNING_RATE": 5e-6,
                "WARMUP": warmup,
                "SCORE": "CIDEr",
                "GET_SCORES": True,
                "TRAINING_BEAM_SIZE": beam,
                "EVALUATING_BEAM_SIZE": beam,
                "PATIENCE": 5,
                "DEVICE_REWARD": False,
                **({"RNG_IMPL": "rbg"} if rbg else {}),
                **(
                    {"MIXED_PRECISION": True, "DECODE_DTYPE": "bfloat16"}
                    if bf16 else {}
                ),
            },
            "MODEL": {
                "ARCHITECTURE": model_arch,
                "NAME": name,
                "DEVICE": "cpu",
                "VISION_EMBEDDING": vision_embedding,
                "ENCODER": {
                    "ARCHITECTURE": enc_arch, "D_MODEL": d_model,
                    "LAYERS": layers,
                    # reference GeometricEncoder reads this key (typo and
                    # all, models/modules/encoders.py:71); False matches
                    # object_relation_transformer.yaml
                    "TRIGNOMETRIC_EMBEDDING": False,
                    "SELF_ATTENTION": enc_attn,
                    **encoder_extra,
                },
                "DECODER": {
                    "ARCHITECTURE": dec_arch, "D_MODEL": d_model,
                    "LAYERS": layers,
                    "ATTENTION": {
                        "D_MODEL": d_model, "N_ENCODER_LAYERS": layers,
                        "SELF_ATTENTION": attn_stateful,
                        "ENC_ATTENTION": dict(attn),
                    },
                    "TEXT_EMBEDDING": {
                        "ARCHITECTURE": "UsualEmbedding",
                        "D_MODEL": d_model,
                        "D_EMBEDDING": d_model, "WORD_EMBEDDING": None,
                        "WORD_EMBEDDING_CACHE": None, "DROPOUT": 0.1,
                    },
                },
            },
        }
    )


class _RewardTap:
    """Wraps a CIDEr scorer; records the mean per-call reward so the SCST
    side-by-side can report reward curves from BOTH stacks without
    touching either training loop."""

    def __init__(self, inner):
        self._inner = inner
        self.rewards = []

    def compute_score(self, gts, gens):
        out = self._inner.compute_score(gts, gens)
        self.rewards.append(float(np.mean(out[1])))
        return out


def _register_ref_dlct():
    """Register a DLCTTransformer into the REFERENCE's architecture
    registry, composed purely of reference modules: the
    DualCollaborativeLevelEncoder (encoders.py:114-211) +
    GeometricDualFeatureEmbedding (vision_embeddings.py:45-70) +
    Decoder, with the same wiring the repo's fixed dlct config uses —
    no shipped reference config exercises these modules (SURVEY.md
    §2.4), so this shim is the only way to get a reference DLCT
    side-by-side (the ORT call-convention shim precedent)."""
    import torch

    from builders.decoder_builder import build_decoder
    from builders.encoder_builder import build_encoder
    from builders.model_builder import META_ARCHITECTURE
    from builders.vision_embedding_builder import build_vision_embedding
    from models.base_transformer import BaseTransformer

    if "DLCTTransformer" in getattr(META_ARCHITECTURE, "_obj_map", {}):
        return

    # reference bug shim (dead-code path, same family as the ORT one):
    # get_combine_masks doc says (bs, 1, n, g*g) but the code returns
    # (bs, 1, 1, n, g*g) (models/utils.py:154 double-unsqueeze), which
    # crashes GeometricDualFeatureEmbedding's permute
    # (vision_embeddings.py:61) — squeeze back to the documented shape
    import models.modules.vision_embeddings as ref_ve

    _orig_combine = ref_ve.get_combine_masks

    def _fixed_combine(boxes, grid_size=7):
        m = _orig_combine(boxes, grid_size)
        while m.dim() > 4:
            m = m.squeeze(1)
        return m

    ref_ve.get_combine_masks = _fixed_combine

    # second latent bug in the same dead path: vision_embeddings.py:62-63
    # concatenates the (bs,1,1,n) key-padding masks directly onto the
    # (bs,1,n,g*g) visibility masks, which cannot broadcast under cat —
    # the key-padding mask must be expanded over the query dim first
    # (the repo's GeometricDualFeatureEmbedding documents the same fix,
    # models/vision_embedding.py)
    from models.utils import generate_padding_mask

    def _fixed_dual_forward(self, region_features, region_boxes,
                            grid_features, grid_boxes):
        region_masks = generate_padding_mask(region_features, padding_idx=0)
        grid_masks = generate_padding_mask(grid_features, padding_idx=0)
        grid_size = int(grid_boxes.shape[1] ** 0.5)
        n_regions = region_features.shape[1]
        n_grids = grid_features.shape[1]
        region2grid_masks = _fixed_combine(region_boxes, grid_size)
        grid2region_masks = region2grid_masks.permute(0, 1, 3, 2)
        region2all_masks = torch.cat(
            [
                region_masks.expand(-1, -1, n_regions, -1),
                region2grid_masks,
            ],
            dim=-1,
        )
        grid2all_masks = torch.cat(
            [
                grid2region_masks,
                grid_masks.expand(-1, -1, n_grids, -1),
            ],
            dim=-1,
        )
        region_features = self.region_proj(region_features)
        region_features = self.grid_dropout(region_features)
        grid_features = self.grid_proj(grid_features)
        grid_features = self.grid_dropout(grid_features)
        return (
            (region_features, region_masks),
            (grid_features, grid_masks),
            (region2all_masks, grid2all_masks),
        )

    ref_ve.GeometricDualFeatureEmbedding.forward = _fixed_dual_forward

    # third latent bug: the DLCT encoder passes the 4-D visibility mask as
    # ``padding_mask`` into EncoderLayer, whose post-FFN masked_fill
    # expects a (bs,1,1,n) key-padding mask (encoders.py:197-206 vs :20) —
    # unbroadcastable.  Correct semantics (and the repo's, models/
    # encoders.py DualCollaborativeLevelEncoder): visibility mask as
    # attention_mask, plain per-query padding mask for the query-row
    # zeroing.  Only the two cross-layer calls change.
    import torch.nn.functional as F

    from models.modules import encoders as ref_enc
    from models.utils import box_relational_embedding

    def _fixed_dlct_forward(self, region_features, region_boxes,
                            region_padding_mask, region2all_mask,
                            grid_features, grid_boxes, grid_padding_mask,
                            grid2all_mask):
        n_regions = region_features.shape[1]
        boxes = torch.cat([region_boxes, grid_boxes], dim=1)
        rel = box_relational_embedding(
            boxes, dim_g=self.d_g,
            trignometric_embedding=self.trignometric_embedding,
        )
        flat = rel.view(-1, self.d_g)
        bs, nk, _, _ = rel.shape
        per_head = [
            fc_g(flat).view([bs, 1, nk, nk]) for fc_g in self.fc_gs
        ]
        w_g = F.relu(torch.cat(per_head, dim=1))

        region_features = self.layer_norm_region(region_features) + \
            self.pos_embedding(region_features)
        grid_features = self.layer_norm_grid(grid_features) + \
            self.pos_embedding(grid_features)
        for l_region, l_grid, l_r2g, l_g2r in zip(
            self.layers_region, self.layers_grid,
            self.region2grid, self.grid2region,
        ):
            region_features = l_region(
                queries=region_features, values=region_features,
                keys=region_features,
                relative_geometry_weights=w_g[:, :, :n_regions, :n_regions],
                padding_mask=region_padding_mask,
                attention_mask=region_padding_mask,
            )
            grid_features = l_grid(
                queries=grid_features, values=grid_features,
                keys=grid_features,
                relative_geometry_weights=w_g[:, :, n_regions:, n_regions:],
                padding_mask=grid_padding_mask,
                attention_mask=grid_padding_mask,
            )
            combined = torch.cat([region_features, grid_features], dim=1)
            combined = combined + self.pos_embedding(combined)
            region_features = l_r2g(
                queries=region_features, keys=combined, values=combined,
                relative_geometry_weights=w_g[:, :, :n_regions, :],
                padding_mask=region_padding_mask,
                attention_mask=region2all_mask,
            )
            grid_features = l_g2r(
                queries=grid_features, keys=combined, values=combined,
                relative_geometry_weights=w_g[:, :, n_regions:, :],
                padding_mask=grid_padding_mask,
                attention_mask=grid2all_mask,
            )
        out = torch.cat([region_features, grid_features], dim=1)
        padding_mask = torch.cat(
            [region_padding_mask, grid_padding_mask], dim=-1
        )
        return out, padding_mask

    ref_enc.DualCollaborativeLevelEncoder.forward = _fixed_dlct_forward

    @META_ARCHITECTURE.register()
    class DLCTTransformer(BaseTransformer):
        def __init__(self, config, vocab):
            super().__init__(vocab)
            self.device = torch.device(config.DEVICE)
            self.vision_embedding = build_vision_embedding(
                config.VISION_EMBEDDING
            )
            self.encoder = build_encoder(config.ENCODER)
            self.decoder = build_decoder(config.DECODER, vocab)

        def encoder_forward(self, input_features):
            (
                (region_features, region_masks),
                (grid_features, grid_masks),
                (region2all_masks, grid2all_masks),
            ) = self.vision_embedding(
                input_features.region_features,
                input_features.region_boxes,
                input_features.grid_features,
                input_features.grid_boxes,
            )
            return self.encoder(
                region_features=region_features,
                region_boxes=input_features.region_boxes,
                region_padding_mask=region_masks,
                region2all_mask=region2all_masks,
                grid_features=grid_features,
                grid_boxes=input_features.grid_boxes,
                grid_padding_mask=grid_masks,
                grid2all_mask=grid2all_masks,
            )  # -> (features, padding_mask)

        def forward(self, input_features):
            features, mask = self.encoder_forward(input_features)
            return self.decoder(
                caption_tokens=input_features.caption_tokens,
                encoder_features=features,
                encoder_attention_mask=mask,
            )


def run_reference(cfg, epochs: int, scst_epochs: int = 0,
                  en_ptb: bool = False):
    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(0)
    from builders.trainer_builder import build_trainer as ref_build_trainer
    from evaluation import Cider as RefCider

    if cfg.MODEL.ARCHITECTURE == "DLCTTransformer":
        _register_ref_dlct()
    t0 = time.time()
    trainer = ref_build_trainer(cfg)
    if cfg.MODEL.ARCHITECTURE == "ObjectRelationTransformer":
        # reference bug shim (same as tests/test_reference_parity.py
        # _fix_ort_encoder_forward): the reference's encoder_forward passes
        # a bare Instance to GeometricEncoder.forward(features, boxes,
        # padding_mask) (models/object_relation_transformer.py:33-43).
        # encoder_forward sits on BOTH halves — the training forward and
        # beam search — so the shim is required for the torch side to run
        # at all, not just to decode
        import types

        def encoder_forward(self, input_features):
            feats, pad_mask = self.vision_embedding(
                input_features.region_features
            )
            enc = self.encoder(
                features=feats,
                boxes=input_features.region_boxes,
                padding_mask=pad_mask,
            )
            return enc, pad_mask

        trainer.model.encoder_forward = types.MethodType(
            encoder_forward, trainer.model
        )
    curves = []
    for epoch in range(epochs):
        trainer.epoch = epoch
        trainer.train()
        val = trainer.evaluate_loss(trainer.val_dataloader)
        curves.append(float(val))
        print(
            f"[ref epoch {epoch}] val_loss={val:.4f} "
            f"t={time.time() - t0:.0f}s",
            flush=True,
        )

    def dev_cider():
        # dev-split beam decode + CIDEr (evaluate_metrics minus the jar
        # METEOR)
        trainer.model.eval()
        gens, gts = {}, {}
        for it, items in enumerate(trainer.val_dict_dataloader):
            with torch.no_grad():
                outs, _ = trainer.model.beam_search(
                    items, batch_size=items.batch_size,
                    beam_size=trainer.evaluating_beam_size, out_size=1,
                )
            caps_gen = trainer.vocab.decode_caption(
                outs.contiguous().view(-1, trainer.vocab.max_caption_length),
                join_words=False,
            )
            for i, (gts_i, gen_i) in enumerate(zip(items.captions, caps_gen)):
                gens[f"{it}_{i}"] = [
                    " ".join(k for k, _ in itertools.groupby(gen_i))
                ]
                gts[f"{it}_{i}"] = gts_i
        if en_ptb:
            # enTrainer-equivalence mode (VERDICT r4 next #9): the real
            # reference enTrainer routes gts/gens through the Java
            # PTBTokenizer jar (en_trainer.py:96-97) — no JVM exists
            # here, and the reference code has a gts/gen variable bug at
            # that exact call site.  Both halves therefore use THIS
            # repo's PTB tokenizer (native C++/Python port, exactness
            # tested in tests/test_native.py), so the comparison
            # isolates the training loop rather than the tokenizer.
            from openviic_tpu.evaluation import PTBTokenizer

            ptb = PTBTokenizer()
            gts = ptb.tokenize({k: list(v) for k, v in gts.items()})
            gens = ptb.tokenize({k: list(v) for k, v in gens.items()})
        return float(RefCider().compute_score(gts, gens)[0]), gens

    cider, gens = dev_cider()
    result = {"val_loss": curves, "cider": cider, "wall_s": time.time() - t0,
              "gens": gens}

    if scst_epochs:
        # the reference's XE->SCST switch (vi_trainer.py:199-208): fresh
        # Adam at RL_LEARNING_RATE over all params; train_cider was
        # precomputed from train captions at trainer init (vi_trainer.py:35)
        from torch.optim import Adam

        trainer.optim = Adam(
            trainer.model.parameters(), lr=cfg.TRAINING.RL_LEARNING_RATE
        )
        tap = _RewardTap(trainer.train_cider)
        trainer.train_cider = tap
        reward_curve = []
        for e in range(scst_epochs):
            trainer.epoch = epochs + e
            n0 = len(tap.rewards)
            trainer.train_scst()
            reward_curve.append(float(np.mean(tap.rewards[n0:])))
            print(
                f"[ref scst epoch {e}] reward={reward_curve[-1]:.4f} "
                f"t={time.time() - t0:.0f}s",
                flush=True,
            )
        scst_cider, _ = dev_cider()
        result["scst"] = {
            "reward_curve": reward_curve,
            "cider": scst_cider,
            "wall_s": time.time() - t0,
        }

    sys.path.remove(REFERENCE)
    return result


def run_repo(cfg, epochs: int, scst_epochs: int = 0):
    from openviic_tpu.builders import build_trainer

    t0 = time.time()
    trainer = build_trainer(cfg)
    curves = []
    for epoch in range(epochs):
        trainer.epoch = epoch
        trainer.train()
        curves.append(float(trainer.evaluate_loss(trainer.val_dataloader)))
        print(
            f"[repo epoch {epoch}] val_loss={curves[-1]:.4f} "
            f"t={time.time() - t0:.0f}s",
            flush=True,
        )
    scores = trainer.evaluate_metrics(trainer.val_dict_dataloader)
    result = {
        "val_loss": curves,
        "cider": float(scores["CIDEr"]),
        "wall_s": time.time() - t0,
    }

    if scst_epochs:
        # mirror of the reference switch: _ensure_scst resets the
        # optimizer to a fresh Adam at RL_LEARNING_RATE
        # (training/trainer.py:561-589)
        trainer.use_rl = True
        trainer._ensure_scst()
        tap = _RewardTap(trainer.train_cider)
        trainer.train_cider = tap
        reward_curve = []
        for e in range(scst_epochs):
            trainer.epoch = epochs + e
            n0 = len(tap.rewards)
            trainer.train_scst()
            if len(tap.rewards) > n0:  # host-reward path
                reward_curve.append(float(np.mean(tap.rewards[n0:])))
            print(
                f"[repo scst epoch {e}] "
                f"reward={reward_curve[-1] if reward_curve else None} "
                f"t={time.time() - t0:.0f}s",
                flush=True,
            )
        scst_scores = trainer.evaluate_metrics(trainer.val_dict_dataloader)
        result["scst"] = {
            "reward_curve": reward_curve,
            "cider": float(scst_scores["CIDEr"]),
            "wall_s": time.time() - t0,
        }
    return result


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--root", default=os.path.join(REPO, "tiny_dataset"))
    parser.add_argument("--d-model", type=int, default=64)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument("--d-ff", type=int, default=128)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--dict-batch", type=int, default=6)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--beam", type=int, default=3)
    parser.add_argument("--arch",
                        choices=["standard", "m2", "ort", "aoa", "camo", "dlct"],
                        default="standard")
    parser.add_argument("--memory", type=int, default=8,
                        help="m2 memory slots (reference config: 40)")
    parser.add_argument("--only", choices=["repo", "ref", "both"],
                        default="both")
    parser.add_argument("--trainer", choices=["viTrainer", "enTrainer"],
                        default="viTrainer",
                        help="enTrainer = English task: repo half runs the "
                             "registered enTrainer (PTB postprocess), ref "
                             "half runs viTrainer + the same PTB applied "
                             "to its dev pairs (jar unavailable offline)")
    parser.add_argument("--scst", type=int, default=0,
                        help="after the XE epochs, switch to SCST "
                             "(reference vi_trainer.py:199-208 semantics) "
                             "and run this many RL epochs on each stack")
    parser.add_argument("--rbg", action="store_true",
                        help="repo half: TPU hardware PRNG for dropout")
    parser.add_argument("--bf16", action="store_true",
                        help="repo half: mixed precision + bf16 decode")
    parser.add_argument("--out", default=None,
                        help="also write the result JSON to this path")
    parser.add_argument("--repo-seed", type=int, default=None,
                        help="repo half: TRAINING.SEED override (init-seed "
                             "spread study, PERF.md noisy benchmark)")
    args = parser.parse_args()

    if not os.path.exists(os.path.join(args.root, "train.json")):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from make_tiny_dataset import main as make_ds

        make_ds(args.root)

    shape = dict(
        d_model=args.d_model, heads=args.heads, layers=args.layers,
        d_ff=args.d_ff, batch=args.batch, dict_batch=args.dict_batch,
        warmup=args.warmup, beam=args.beam,
        arch=args.arch, memory=args.memory,
    )
    # key the checkpoint dirs by dataset root AND wipe them: the trainer
    # (faithfully to reference base_trainer.py:26-33) caches vocab.bin in
    # the checkpoint dir and reloads it if present — a stale dir from a
    # run on a different dataset silently poisons the vocab
    import shutil

    tag = (f"{args.arch}_d{args.d_model}_"
           f"{os.path.basename(os.path.normpath(args.root))}"
           + ("_en" if args.trainer == "enTrainer" else ""))
    for half in ("repo", "ref"):
        shutil.rmtree(f"/tmp/{half}_compare_ckpt_{tag}", ignore_errors=True)
    result = {"epochs": args.epochs, "shape": shape}

    if args.only in ("repo", "both"):
        cfg_repo = shared_config(
            args.root, f"/tmp/repo_compare_ckpt_{tag}", "repo_compare",
            rbg=args.rbg, bf16=args.bf16, trainer=args.trainer, **shape,
        )
        if args.repo_seed is not None:
            cfg_repo.TRAINING._data["SEED"] = args.repo_seed
        print("== running repo trainer ==", flush=True)
        repo = run_repo(cfg_repo, args.epochs, scst_epochs=args.scst)
        result["repo"] = {k: v for k, v in repo.items() if k != "gens"}
        if args.out:  # incremental: XE+SCST repo results survive a later
            with open(args.out, "w") as f:  # reference-half crash
                json.dump(result, f, indent=2)
    if args.only in ("ref", "both"):
        cfg_ref = shared_config(
            args.root, f"/tmp/ref_compare_ckpt_{tag}", "ref_compare", **shape,
        )
        print("== running reference trainer (torch CPU) ==", flush=True)
        ref = run_reference(cfg_ref, args.epochs, scst_epochs=args.scst,
                            en_ptb=args.trainer == "enTrainer")
        result["reference"] = {k: v for k, v in ref.items() if k != "gens"}

    out = json.dumps(result, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
