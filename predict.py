"""Batch captioning CLI (serving entry point).

Usage:
  python predict.py --config-file configs/<cfg>.yaml \
      [--checkpoint-dir DIR] [--features-dir DIR] \
      [--output captions.json] [--beam N] [--batch N]

Loads the best checkpoint trained under the config's checkpoint path and
captions every ``<image_id>.npy`` in the features directory (defaults to
the config's ``DATASET.FEATURE_PATH.FEATURES``).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description="OpenViIC-TPU batch captioning")
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument(
        "--checkpoint-dir",
        type=str,
        default=None,
        help="checkpoint directory (default: the config's "
        "TRAINING.CHECKPOINT_PATH/MODEL.NAME; point at a migrated "
        "reference run, see scripts/import_reference_checkpoint.py)",
    )
    parser.add_argument("--features-dir", type=str, default=None)
    parser.add_argument("--output", type=str, default="captions.json")
    parser.add_argument("--beam", type=int, default=None)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--f32", action="store_true", help="disable bf16 decode")
    args = parser.parse_args()

    from openviic_tpu.config import get_config
    from openviic_tpu.serving import CaptioningPipeline

    config = get_config(args.config_file)
    pipeline = CaptioningPipeline(
        config,
        checkpoint_dir=args.checkpoint_dir,
        beam_size=args.beam,
        batch_size=args.batch,
        use_bf16=not args.f32,
    )
    features_dir = args.features_dir or config.DATASET.FEATURE_PATH.FEATURES
    captions = pipeline.caption_directory(features_dir)
    with open(args.output, "w") as f:
        json.dump(captions, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(captions)} captions to {args.output}")


if __name__ == "__main__":
    main()
