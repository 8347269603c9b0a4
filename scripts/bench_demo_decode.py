"""Decode throughput on the trained RSTNet / DLCT demo checkpoints.

Completes the convergence-demo record (VERDICT r3 next #3): beam-5
decode captions/s for the architecture variants whose decode paths carry
extra state — RSTNet's frozen language-model stream (every step runs the
4-layer RoBERTa over the generated prefix) and DLCT's dual
region+grid cross-attention.  Served through the production
``CaptioningPipeline`` over the demo run's features dir.

Usage: python scripts/bench_demo_decode.py {rstnet|dlct} [workdir]
       (after scripts/run_demo_variants.py <variant> <workdir>)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "rstnet"
    work = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/openviic_demo_{variant}"
    dataset = os.path.join(work, "dataset")

    from openviic_tpu.config import get_config
    from openviic_tpu.serving import CaptioningPipeline

    config_file = {
        "rstnet": "configs/tpu/rstnet_fixed.yaml",
        "dlct": "configs/tpu/dlct_fixed.yaml",
    }[variant]
    overrides = [
        "DATASET.JSON_PATH.TRAIN", os.path.join(dataset, "train.json"),
        "DATASET.JSON_PATH.DEV", os.path.join(dataset, "dev.json"),
        "DATASET.JSON_PATH.TEST", os.path.join(dataset, "test.json"),
        "DATASET.FEATURE_PATH.FEATURES", os.path.join(dataset, "features"),
        "TRAINING.CHECKPOINT_PATH", os.path.join(work, "runs"),
        "MODEL.NAME", f"demo_{variant}",
    ]
    if variant == "rstnet":
        overrides += [
            "MODEL.DECODER.LANGUAGE_MODEL.PRETRAINED_NAME",
            os.path.join(work, "local_roberta"),
        ]
    config = get_config(os.path.join(ROOT, config_file), overrides)

    batch = 64
    pipe = CaptioningPipeline(config, batch_size=batch, beam_size=5)
    feat_dir = os.path.join(dataset, "features")
    ids = sorted(
        (os.path.splitext(f)[0] for f in os.listdir(feat_dir)
         if f.endswith(".npy")),
        key=lambda s: int(s),
    )[: 3 * batch]

    t0 = time.perf_counter()
    caps = pipe.caption_directory(feat_dir, ids)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    caps = pipe.caption_directory(feat_dir, ids)
    steady_s = time.perf_counter() - t0
    non_empty = sum(1 for c in caps.values() if c.strip())
    print(json.dumps({
        "variant": variant,
        "images": len(ids),
        "beam": 5,
        "batch": batch,
        "warm_s": round(warm_s, 2),
        "steady_s": round(steady_s, 2),
        "captions_per_sec": round(len(ids) / steady_s, 1),
        "non_empty": non_empty,
        "example": next(iter(caps.values())),
    }, ensure_ascii=False))


if __name__ == "__main__":
    main()
