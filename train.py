"""CLI entry point.

Reference equivalent: train.py:1-19 (``python train.py --config-file
<yaml>``).  Note the reference ships with ``trainer.start()`` commented out
(train.py:17) so its CLI only evaluates; here training runs by default and
``--eval-only`` reproduces the reference's as-shipped behavior.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="OpenViIC-TPU")
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument(
        "--eval-only",
        action="store_true",
        help="skip training; only run test-set predictions (reference default)",
    )
    parser.add_argument(
        "--max-epochs", type=int, default=None, help="cap training epochs"
    )
    parser.add_argument(
        "opts",
        nargs=argparse.REMAINDER,
        help="dotted config overrides, e.g. TRAINING.WARMUP 100",
    )
    args = parser.parse_args()

    from openviic_tpu.builders import build_trainer
    from openviic_tpu.config import get_config
    from openviic_tpu.parallel.runtime import initialize_distributed

    initialize_distributed()
    config = get_config(args.config_file, args.opts or None)
    trainer = build_trainer(config)
    if not args.eval_only:
        trainer.start(max_epochs=args.max_epochs)
    trainer.get_predictions(get_scores=config.TRAINING.GET_SCORES)


if __name__ == "__main__":
    main()
