"""Migrate a reference (PyTorch OpenViIC) run into this framework.

Usage:
  python scripts/import_reference_checkpoint.py \
      --config-file configs/standard_transformer.yaml \
      --checkpoint /path/to/saved_models/<name>/best_model.pth \
      [--vocab-bin /path/to/saved_models/<name>/vocab.bin] \
      [--out saved_models/<name>] [--also-last] [--allow-missing]

Produces ``best_model.ckpt`` + ``vocab.bin`` in the output directory
(defaults to the config's ``TRAINING.CHECKPOINT_PATH/MODEL.NAME``), ready
for ``predict.py``, ``serve.py``, ``train.py --eval-only``, or — with
``--also-last`` — continued training.  The torch Adam moments are carried
into the optax state when the payload has them (a ``last_model.pth``
does), so training resumes seamlessly; epoch/patience/SCST-phase flags
and the LR-schedule position carry over either way.

The vocab is adopted from the reference's pickled ``vocab.bin`` when
available (looked up next to the checkpoint by default), else rebuilt
from the config's annotation JSONs — both paths are bit-identical to the
reference's vocabulary (tests/test_vocab.py, tests/test_migrate.py).
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Import a reference OpenViIC .pth checkpoint"
    )
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument(
        "--checkpoint", type=str, required=True, help="reference *.pth file"
    )
    parser.add_argument(
        "--vocab-bin",
        type=str,
        default=None,
        help="reference vocab.bin (default: next to the checkpoint, else "
        "rebuild from the config's annotation JSONs)",
    )
    parser.add_argument("--out", type=str, default=None, help="output directory")
    parser.add_argument(
        "--also-last",
        action="store_true",
        help="also write last_model.ckpt so training can continue",
    )
    parser.add_argument(
        "--allow-missing",
        action="store_true",
        help="keep random init for params absent from the reference checkpoint",
    )
    args = parser.parse_args()

    from openviic_tpu.compat.migrate import import_reference_checkpoint
    from openviic_tpu.config import get_config

    config = get_config(args.config_file)
    report = import_reference_checkpoint(
        config,
        args.checkpoint,
        out_dir=args.out,
        vocab_bin=args.vocab_bin,
        write_last=args.also_last,
        allow_missing=args.allow_missing,
    )
    print(
        f"imported -> {report['best']} (epoch {report.get('epoch')}, "
        f"step {report['step']}, missing {len(report['missing'])}, "
        f"unused reference keys {len(report['unused'])})"
    )
    if report["missing"]:
        print("missing (kept at random init):")
        for name in report["missing"]:
            print(f"  {name}")


if __name__ == "__main__":
    main()
