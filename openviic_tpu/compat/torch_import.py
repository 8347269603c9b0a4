"""Import reference (PyTorch) checkpoints into Flax params.

Lets users of the reference bring their trained weights: maps the
reference's ``model.state_dict()`` naming (as saved by
trainers/base_trainer.py:138-153 under ``state_dict``) onto this
framework's param tree.  Convention differences handled:

 - torch ``Linear.weight`` (out, in) -> flax ``kernel`` (in, out), transposed;
 - ``LayerNorm.weight`` -> ``scale``;
 - ``Embedding.weight`` -> ``embedding``;
 - module-list names: ``layers.{i}`` -> ``layer_{i}``, DLCT stacks,
   meshed ``fc_alphas.{j}`` -> ``fc_alpha_{j}``;
 - the geometric per-head ``fc_gs.{h}`` Linear(d_g, 1) clones -> one fused
   Dense(d_g, h) (columns stacked);
 - reference-only buffers (``running_*`` decode state, frozen ``pos_emb``
   tables) are recomputed here and skipped.

Works for every architecture family whose modules exist in both code
bases (Standard/AoA/M²/ORT/CAMO/Unified/DLCT).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_SKIP_SUFFIXES = (
    "running_keys",
    "running_values",
    "running_mask_self_attention",
    "running_seq",
    "encoder_features",
    "encoder_padding_mask",
)

# flax scope segment -> reference module path segment
_SEGMENT_MAP = {
    "word_emb": "word_emb",
    "embedding": "components",  # UsualEmbedding's nn.Embedding
}


def _ref_key(path: Tuple[str, ...]) -> Optional[Tuple[str, str]]:
    """flax param path -> (reference state_dict key, kind).

    kind: 'linear_w' | 'linear_b' | 'ln_w' | 'ln_b' | 'emb' | 'direct'
    Returns None for params with no reference counterpart."""
    parts: List[str] = []
    leaf = path[-1]
    for seg in path[:-1]:
        if seg == "params":
            continue
        if seg.startswith("layer_") and seg[6:].isdigit():
            parts.append(f"layers.{seg[6:]}")
        elif seg.startswith("region2grid_"):
            parts.append(f"region2grid.{seg.split('_')[-1]}")
        elif seg.startswith("grid2region_"):
            parts.append(f"grid2region.{seg.split('_')[-1]}")
        elif seg.startswith("region_") and seg.split("_")[-1].isdigit():
            parts.append(f"layers_region.{seg.split('_')[-1]}")
        elif seg.startswith("grid_") and seg.split("_")[-1].isdigit():
            parts.append(f"layers_grid.{seg.split('_')[-1]}")
        elif seg.startswith("fc_alpha_"):
            parts.append(f"fc_alphas.{seg.split('_')[-1]}")
        elif seg in _SEGMENT_MAP:
            mapped = _SEGMENT_MAP[seg]
            if mapped:
                parts.append(mapped)
        else:
            parts.append(seg)
    prefix = ".".join(parts)

    if leaf == "kernel":
        return (f"{prefix}.weight", "linear_w")
    if leaf == "bias":
        # LayerNorm bias and Linear bias share the name; kind decided by
        # sibling ('scale' handled below); treat as generic bias
        return (f"{prefix}.bias", "linear_b")
    if leaf == "scale":
        return (f"{prefix}.weight", "ln_w")
    if leaf == "embedding":
        return (f"{prefix}.weight", "emb")
    if leaf in ("m_k", "m_v"):
        return (f"{prefix}.{leaf}", "direct")
    return None


def convert_torch_state_dict(
    state_dict: Dict[str, Any], params_template: Dict
) -> Tuple[Dict, List[str], List[str]]:
    """Convert a reference ``state_dict`` into this framework's params.

    Returns (params, missing_keys, unused_reference_keys).  Values may be
    torch tensors or numpy arrays."""

    def to_np(v) -> np.ndarray:
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    sd = {k: v for k, v in state_dict.items() if not k.endswith(_SKIP_SUFFIXES)}
    used = set()
    missing: List[str] = []

    import jax

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]

    def path_strs(path) -> Tuple[str, ...]:
        return tuple(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )

    new_leaves = {}
    for path, leaf in flat:
        strs = path_strs(path)
        # fused geometry projection: gather the per-head clones
        if "fc_gs" in strs:
            prefix = ".".join(
                s for s in strs[:-1] if s not in ("params", "fc_gs")
            )
            prefix = (prefix + "." if prefix else "") + "fc_gs"
            h = leaf.shape[-1]
            if strs[-1] == "kernel":
                cols = []
                ok = True
                for j in range(h):
                    key = f"{prefix}.{j}.weight"
                    if key not in sd:
                        ok = False
                        break
                    cols.append(to_np(sd[key])[0])  # (d_g,)
                    used.add(key)
                if ok:
                    new_leaves[strs] = np.stack(cols, axis=-1)
                    continue
            else:  # bias
                vals = []
                ok = True
                for j in range(h):
                    key = f"{prefix}.{j}.bias"
                    if key not in sd:
                        ok = False
                        break
                    vals.append(to_np(sd[key])[0])
                    used.add(key)
                if ok:
                    new_leaves[strs] = np.asarray(vals)
                    continue
            missing.append(".".join(strs))
            new_leaves[strs] = np.asarray(leaf)
            continue

        mapped = _ref_key(strs)
        if mapped is None:
            new_leaves[strs] = np.asarray(leaf)
            continue
        key, kind = mapped
        if key not in sd:
            missing.append(".".join(strs))
            new_leaves[strs] = np.asarray(leaf)
            continue
        value = to_np(sd[key])
        used.add(key)
        if kind == "linear_w" and value.ndim == 2:
            value = value.T
        new_leaves[strs] = value.reshape(np.asarray(leaf).shape)

    unused = [k for k in sd if k not in used]

    def rebuild(path, leaf):
        return new_leaves[path_strs(path)]

    params = jax.tree_util.tree_map_with_path(rebuild, params_template)
    return params, missing, unused


def load_reference_checkpoint(path: str, params_template: Dict):
    """Load a reference ``*.pth`` checkpoint file (torch serialization)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    return convert_torch_state_dict(state_dict, params_template)
