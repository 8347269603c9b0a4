"""Graft real pretrained HF weights into an RSTNet parameter tree.

The RSTNet-style ``AdaptiveDecoder`` consumes language signals from a
frozen pretrained LM (reference models/language_models.py:11-133 loads a
real BERT/PhoBERT).  Offline, this framework initialises the same HF
architecture randomly (models/language_models.py ``_HFBackboneAdapter``)
— this script replaces that random ``backbone/hf`` subtree with the
actual ``FlaxRobertaModel/FlaxBertModel.from_pretrained(...)`` weights,
either in-memory (``graft_hf_params``) or on a saved checkpoint (CLI).

Usage:
    python scripts/graft_hf.py --checkpoint saved_models/my_run \\
        --hf vinai/phobert-base [--model-class FlaxRobertaModel]

The HF name may be a hub id (requires a populated local HF cache when
offline) or a local directory produced by ``save_pretrained``.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, Tuple


def load_hf_params(name_or_path: str, model_class: str = "FlaxRobertaModel"):
    """Load pretrained Flax params for the given HF model."""
    import transformers

    cls = getattr(transformers, model_class)
    model = cls.from_pretrained(name_or_path)
    return model.params


def _tree_shapes(tree) -> Dict[Tuple[str, ...], Tuple[int, ...]]:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        tuple(str(getattr(p, "key", p)) for p in path): tuple(leaf.shape)
        for path, leaf in flat
    }


def graft_hf_params(params, name_or_path: str,
                    model_class: str = "FlaxRobertaModel"):
    """Return ``params`` with every ``backbone/hf`` subtree replaced by the
    pretrained weights.  Validates that the architectures match exactly
    (same tree structure and leaf shapes) before replacing.

    Raises ValueError when no graft point exists (the model was built
    without an HF backbone — e.g. PRETRAINED_NAME unset, which selects the
    _MiniBertBackbone stand-in) or when shapes mismatch (the model was
    built from a different config than the checkpoint's)."""
    def find_graft_points(tree) -> int:
        if not isinstance(tree, dict):
            return 0
        n = 0
        for key, value in tree.items():
            if key == "backbone" and isinstance(value, dict) and "hf" in value:
                n += 1
            else:
                n += find_graft_points(value)
        return n

    if find_graft_points(params) == 0:
        raise ValueError(
            "no backbone/hf scope found in params — the model was built "
            "without an HF backbone (set MODEL.DECODER.LANGUAGE_MODEL."
            "PRETRAINED_NAME so the real architecture is constructed)"
        )

    hf_params = load_hf_params(name_or_path, model_class)
    hf_shapes = _tree_shapes(hf_params)
    grafted = {"count": 0}

    def replace(tree: Any):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, value in tree.items():
            if (
                key == "backbone"
                and isinstance(value, dict)
                and "hf" in value
            ):
                target_shapes = _tree_shapes(value["hf"])
                if target_shapes != hf_shapes:
                    missing = set(target_shapes) ^ set(hf_shapes)
                    diff = {
                        k: (target_shapes.get(k), hf_shapes.get(k))
                        for k in list(target_shapes) + list(hf_shapes)
                        if target_shapes.get(k) != hf_shapes.get(k)
                    }
                    raise ValueError(
                        f"HF checkpoint does not match the model's backbone "
                        f"architecture; first differences: "
                        f"{dict(list(diff.items())[:5])} (missing/extra: "
                        f"{list(missing)[:5]})"
                    )
                out[key] = {**value, "hf": hf_params}
                grafted["count"] += 1
            else:
                out[key] = replace(value)
        return out

    return replace(params)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="checkpoint file (e.g. saved_models/x/last_model.ckpt)")
    parser.add_argument("--hf", required=True, help="HF model id or local dir")
    parser.add_argument("--model-class", default="FlaxRobertaModel")
    args = parser.parse_args(argv)

    import os
    import pickle

    from flax import serialization

    if not os.path.exists(args.checkpoint):
        print(f"no checkpoint at {args.checkpoint}", file=sys.stderr)
        return 1
    with open(args.checkpoint, "rb") as f:
        payload = pickle.load(f)
    # params are stored as template-free msgpack (training/checkpoint.py)
    params = serialization.msgpack_restore(payload["params"])
    params = graft_hf_params(params, args.hf, args.model_class)
    payload["params"] = serialization.msgpack_serialize(params)
    tmp = args.checkpoint + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, args.checkpoint)
    print(f"grafted {args.hf} into {args.checkpoint}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
