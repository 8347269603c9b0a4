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
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def shared_config(root: str, ckpt: str, name: str):
    from openviic_tpu.config import ConfigNode

    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 4, "D_MODEL": 64, "D_KEY": 16, "D_VALUE": 16,
        "D_FF": 128, "D_FEATURE": 128, "MEMORY": 8,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.1,
    }
    attn_stateful = dict(attn, CAN_BE_STATEFUL=True)
    return ConfigNode(
        {
            "TRAINER": "viTrainer",
            "DATASET": {
                "FEATURE_BATCH_SIZE": 8,
                "DICT_BATCH_SIZE": 6,
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
                "WARMUP": 100,
                "SCORE": "CIDEr",
                "GET_SCORES": True,
                "TRAINING_BEAM_SIZE": 3,
                "EVALUATING_BEAM_SIZE": 3,
                "PATIENCE": 5,
                "DEVICE_REWARD": False,
            },
            "MODEL": {
                "ARCHITECTURE": "StandardTransformerUsingRegion",
                "NAME": name,
                "DEVICE": "cpu",
                "VISION_EMBEDDING": {
                    "ARCHITECTURE": "FeatureEmbedding",
                    "D_FEATURE": 1024, "D_MODEL": 64, "DROPOUT": 0.1,
                },
                "ENCODER": {
                    "ARCHITECTURE": "Encoder", "D_MODEL": 64, "LAYERS": 2,
                    "SELF_ATTENTION": dict(attn),
                },
                "DECODER": {
                    "ARCHITECTURE": "Decoder", "D_MODEL": 64, "LAYERS": 2,
                    "ATTENTION": {
                        "D_MODEL": 64, "N_ENCODER_LAYERS": 2,
                        "SELF_ATTENTION": attn_stateful,
                        "ENC_ATTENTION": dict(attn),
                    },
                    "TEXT_EMBEDDING": {
                        "ARCHITECTURE": "UsualEmbedding", "D_MODEL": 64,
                        "D_EMBEDDING": 64, "WORD_EMBEDDING": None,
                        "WORD_EMBEDDING_CACHE": None, "DROPOUT": 0.1,
                    },
                },
            },
        }
    )


def run_reference(cfg, epochs: int):
    sys.path.insert(0, REFERENCE)
    import torch

    torch.manual_seed(0)
    from builders.trainer_builder import build_trainer as ref_build_trainer
    from evaluation import Cider as RefCider

    t0 = time.time()
    trainer = ref_build_trainer(cfg)
    curves = []
    for epoch in range(epochs):
        trainer.epoch = epoch
        trainer.train()
        val = trainer.evaluate_loss(trainer.val_dataloader)
        curves.append(float(val))

    # dev-split beam decode + CIDEr (evaluate_metrics minus the jar METEOR)
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
            gens[f"{it}_{i}"] = [" ".join(k for k, _ in itertools.groupby(gen_i))]
            gts[f"{it}_{i}"] = gts_i
    cider = float(RefCider().compute_score(gts, gens)[0])
    wall = time.time() - t0
    sys.path.remove(REFERENCE)
    return {"val_loss": curves, "cider": cider, "wall_s": wall, "gens": gens}


def run_repo(cfg, epochs: int):
    from openviic_tpu.builders import build_trainer

    t0 = time.time()
    trainer = build_trainer(cfg)
    curves = []
    for epoch in range(epochs):
        trainer.epoch = epoch
        trainer.train()
        curves.append(float(trainer.evaluate_loss(trainer.val_dataloader)))
    scores = trainer.evaluate_metrics(trainer.val_dict_dataloader)
    wall = time.time() - t0
    return {
        "val_loss": curves,
        "cider": float(scores["CIDEr"]),
        "wall_s": wall,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--root", default=os.path.join(REPO, "tiny_dataset"))
    args = parser.parse_args()

    if not os.path.exists(os.path.join(args.root, "train.json")):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from make_tiny_dataset import main as make_ds

        make_ds(args.root)

    cfg_ref = shared_config(args.root, "/tmp/ref_compare_ckpt", "ref_compare")
    cfg_repo = shared_config(args.root, "/tmp/repo_compare_ckpt", "repo_compare")

    print("== running repo trainer ==", flush=True)
    repo = run_repo(cfg_repo, args.epochs)
    print("== running reference trainer (torch CPU) ==", flush=True)
    ref = run_reference(cfg_ref, args.epochs)

    result = {
        "epochs": args.epochs,
        "repo": {k: v for k, v in repo.items() if k != "gens"},
        "reference": {k: v for k, v in ref.items() if k != "gens"},
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
