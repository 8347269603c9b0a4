"""Caption-serving CLI: load a trained checkpoint and serve HTTP.

Usage:
  python serve.py --config-file configs/standard_transformer.yaml \
      [--checkpoint-dir DIR] [--port 8080] [--beam 3] [--batch 32] \
      [--backbone patch|hf:<model>]

Endpoints: POST /caption (raw image bytes), POST /caption_features
(np.savez archive of plain arrays), GET /healthz.  See
openviic_tpu/server.py.

Trust boundary: the server binds 127.0.0.1 by default.  Pass
--host 0.0.0.0 only behind an authenticating proxy — request bodies are
untrusted and are parsed with pickle disabled, but there is no built-in
auth/rate limiting.
"""

from __future__ import annotations

import argparse

from openviic_tpu.config import get_config
from openviic_tpu.serving import CaptioningPipeline
from openviic_tpu.server import CaptionServer


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="checkpoint directory (default: the config's "
                         "TRAINING.CHECKPOINT_PATH/MODEL.NAME; point at a "
                         "migrated reference run, see "
                         "scripts/import_reference_checkpoint.py)")
    ap.add_argument("--host", default="127.0.0.1",
                    help="bind address; 0.0.0.0 only behind a trusted proxy")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--beam", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--backbone", default="patch",
                    help="image feature backbone: 'patch' or 'hf:<model>'")
    ap.add_argument("--grid", type=int, default=7)
    ap.add_argument("opts", nargs="*", help="dotted config overrides")
    args = ap.parse_args()

    config = get_config(args.config_file, args.opts)
    pipeline = CaptioningPipeline(
        config, checkpoint_dir=args.checkpoint_dir,
        beam_size=args.beam, batch_size=args.batch,
    )
    server = CaptionServer(
        pipeline, host=args.host, port=args.port,
        max_batch=args.batch, max_wait_ms=args.max_wait_ms,
        backbone=args.backbone, grid=args.grid,
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
