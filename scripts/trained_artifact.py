"""Shared loader for the committed trained-bench artifact.

Produced by scripts/export_trained_bench.py: the reference-scale d512
model's f16 params as a flat npz, the pickled Vocab, the held-out test
features and references.  Round 5 prefers
``saved_models/realistic_d512_bench`` (trained on the realistic-language
benchmark — Zipf vocab ~7k, 21.7-token captions, 5 refs/image, oracle
ceiling <1) and falls back to the retired vocab-51
``signal_d512_bench``.  bench.py and scripts/bench_latency.py both
decode it — this module is the single place that knows the format.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CANDIDATES = [
    os.path.join(REPO, "saved_models", "realistic_d512_bench"),
    os.path.join(REPO, "saved_models", "signal_d512_bench"),
]
ARTIFACT_DIR = next(
    (d for d in _CANDIDATES if os.path.isdir(d)), _CANDIDATES[0]
)


def load_trained_artifact(workdir: str = "/tmp/bench_trained") -> Dict[str, Any]:
    """Load the artifact: model, f32 params, vocab, padded test features.

    Returns a dict with keys ``model``, ``params``, ``vocab``, ``feats``
    (zero-padded to the max region count — all-zero rows are masked by
    the vision embedding's padding mask), ``ids``, ``refs``; raises
    FileNotFoundError when the artifact directory is absent."""
    if not os.path.isdir(ARTIFACT_DIR):
        raise FileNotFoundError(ARTIFACT_DIR)

    import jax.numpy as jnp

    from compare_training_vs_reference import shared_config
    from openviic_tpu.builders import build_model

    with open(os.path.join(ARTIFACT_DIR, "vocab.bin"), "rb") as f:
        vocab = pickle.load(f)
    cfg = shared_config("/nonexistent", workdir, "bench",
                        d_model=512, heads=8, layers=3, d_ff=2048)
    model = build_model(cfg.MODEL, vocab)

    nested: dict = {}
    with np.load(os.path.join(ARTIFACT_DIR, "params_f16.npz")) as z:
        for key in z.files:
            node = nested
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key], jnp.float32)

    with np.load(os.path.join(ARTIFACT_DIR, "test_features.npz")) as z:
        ids = list(z.files)
        raw = [z[i].astype(np.float32) for i in ids]
    max_r = max(a.shape[0] for a in raw)
    feats = np.zeros((len(raw), max_r, raw[0].shape[1]), np.float32)
    for i, a in enumerate(raw):
        feats[i, : a.shape[0]] = a

    refs_path = os.path.join(ARTIFACT_DIR, "test_refs.json")
    refs = None
    if os.path.isfile(refs_path):
        with open(refs_path) as f:
            refs = json.load(f)

    return {
        "model": model,
        "params": nested,
        "vocab": vocab,
        "feats": feats,
        "ids": ids,
        "refs": refs,
    }
