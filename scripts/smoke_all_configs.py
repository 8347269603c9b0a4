"""Smoke every shipped config at reference scale on the current backend:
build -> init -> teacher-forced forward -> beam-3 decode.  Prints one
OK/FAIL line per config."""

from __future__ import annotations

import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _tiny_vocab
from openviic_tpu.builders import build_model
from openviic_tpu.config import get_config
from openviic_tpu.decoding import beam_search

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def make_batch(vocab, bs=4, n_regions=20, n_grids=49):
    rng = np.random.default_rng(0)
    caption = np.full((bs, vocab.max_caption_length), 0, np.int32)
    caption[:, 0] = vocab.bos_idx
    caption[:, 1:6] = rng.integers(4, len(vocab), size=(bs, 5))
    boxes = rng.uniform(0, 0.5, (bs, n_regions, 4)).astype(np.float32)
    boxes[..., 2:] += 0.3
    gb = np.stack(
        [
            np.repeat(np.arange(7), 7) / 7,
            np.tile(np.arange(7), 7) / 7,
            (np.repeat(np.arange(7), 7) + 1) / 7,
            (np.tile(np.arange(7), 7) + 1) / 7,
        ],
        axis=-1,
    ).astype(np.float32)
    return {
        "caption_tokens": jnp.asarray(caption),
        "region_features": jnp.asarray(
            rng.normal(size=(bs, n_regions, 1024)).astype(np.float32)
        ),
        "region_boxes": jnp.asarray(boxes),
        "grid_features": jnp.asarray(
            rng.normal(size=(bs, n_grids, 2048)).astype(np.float32)
        ),
        "grid_boxes": jnp.asarray(np.broadcast_to(gb, (bs, n_grids, 4)).copy()),
    }


def main() -> None:
    vocab = _tiny_vocab(size=1000, max_len=20)
    results = []
    for path in sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))):
        name = os.path.basename(path)
        if name == "tiny_test.yaml":
            continue
        t0 = time.time()
        try:
            cfg = get_config(path)
            if "LANGUAGE_MODEL" in cfg.MODEL.DECODER:
                cfg.merge_from_list(
                    [
                        "MODEL.DECODER.LANGUAGE_MODEL.VOCAB_SIZE", str(len(vocab)),
                        "MODEL.DECODER.LANGUAGE_MODEL.HIDDEN_SIZE", "64",
                        "MODEL.DECODER.LANGUAGE_MODEL.MAX_LEN", "20",
                        "MODEL.DECODER.LANGUAGE_MODEL.BACKBONE_LAYERS", "1",
                    ]
                )
            model = build_model(cfg.MODEL, vocab)
            batch = make_batch(vocab)
            params = model.init(jax.random.PRNGKey(0), batch)
            out = model.apply(params, batch)
            assert np.isfinite(np.asarray(out)).all()
            outs, _ = jax.jit(
                lambda p, b: beam_search(model, p, b, beam_size=3, out_size=1)
            )(params, batch)
            toks = np.asarray(outs)
            assert toks.shape == (4, vocab.max_caption_length)
            results.append((name, "OK", time.time() - t0))
        except Exception as e:
            traceback.print_exc()
            results.append((name, f"FAIL: {type(e).__name__}: {e}", time.time() - t0))
        print(f"{results[-1][1][:60]:<60} {results[-1][2]:6.1f}s  {name}", flush=True)

    fails = [r for r in results if r[1] != "OK"]
    print(f"\n{len(results) - len(fails)}/{len(results)} configs OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
