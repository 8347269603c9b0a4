"""Mid-scale TPU convergence demos for the RSTNet and DLCT architectures
(VERDICT r2 #8) — the same recipe as scripts/run_demo.sh (1000-image
signal-bearing synthetic dataset, TPU-tuned config, train to patience,
report held-out test scores) applied to the two `_fixed` architectures:

  rstnet  AdaptiveDecoder + frozen HF language signals.  Offline there
          are no real phobert weights, so the demo builds a local
          RobertaModel via save_pretrained (the mechanism
          scripts/graft_hf.py grafts real weights through — same code
          path as a hub download, reference models/language_models.py:17-21)
          and points MODEL.DECODER.LANGUAGE_MODEL.PRETRAINED_NAME at it.
  dlct    DualCollaborativeLevelEncoder over region+grid features with
          geometric alignment masks (needs the grid stream, so the
          dataset is generated WITHOUT --no-grids).

Usage:  python scripts/run_demo_variants.py {rstnet|dlct} [workdir]
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def make_local_roberta(path: str) -> str:
    """A phobert-shaped (but 4-layer, random-init) local FlaxRoberta —
    offline stand-in for vinai/phobert-base; graft_hf.py grafts real
    weights through the identical save_pretrained/from_pretrained path."""
    if os.path.exists(os.path.join(path, "config.json")):
        return path
    from transformers import FlaxRobertaModel, RobertaConfig

    cfg = RobertaConfig(
        vocab_size=64001,
        hidden_size=768,
        num_hidden_layers=4,
        num_attention_heads=12,
        intermediate_size=3072,
        max_position_embeddings=130,
        pad_token_id=0,
    )
    model = FlaxRobertaModel(cfg, seed=0)
    model.save_pretrained(path)
    return path


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "rstnet"
    assert variant in ("rstnet", "dlct"), variant
    work = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/openviic_demo_{variant}"
    dataset = os.path.join(work, "dataset")

    if not os.path.isfile(os.path.join(dataset, "train.json")):
        # grids on: DLCT consumes the dual region+grid streams
        subprocess.run(
            [
                sys.executable,
                os.path.join(HERE, "make_tiny_dataset.py"),
                dataset,
                "--n-images", "1000",
                "--signal",
            ],
            check=True,
        )

    overrides = [
        "DATASET.JSON_PATH.TRAIN", os.path.join(dataset, "train.json"),
        "DATASET.JSON_PATH.DEV", os.path.join(dataset, "dev.json"),
        "DATASET.JSON_PATH.TEST", os.path.join(dataset, "test.json"),
        "DATASET.FEATURE_PATH.FEATURES", os.path.join(dataset, "features"),
        "TRAINING.CHECKPOINT_PATH", os.path.join(work, "runs"),
        "TRAINING.WARMUP", "1000",
        "TRAINING.PATIENCE", "3",
        "MODEL.NAME", f"demo_{variant}",
    ]
    if variant == "rstnet":
        config = "configs/tpu/rstnet_fixed.yaml"
        lm_dir = make_local_roberta(os.path.join(work, "local_roberta"))
        overrides += [
            "MODEL.DECODER.LANGUAGE_MODEL.PRETRAINED_NAME", lm_dir,
        ]
    else:
        config = "configs/tpu/dlct_fixed.yaml"
        # the synthetic grid stream is 2048-d 7x7 (make_tiny_dataset)

    cmd = [
        sys.executable,
        os.path.join(ROOT, "train.py"),
        "--config-file", os.path.join(ROOT, config),
        "--max-epochs", "20",
    ] + overrides
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=ROOT)
    print(f"Artifacts: {work}/runs/demo_{variant}/")


if __name__ == "__main__":
    main()
