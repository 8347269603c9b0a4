"""Visual feature extraction backbones (images -> grid/region features).

The reference consumes pre-extracted features and ships no extractor
(data_utils/dataset.py:45-49 just loads ``{image_id}.npy``).  These
backbones produce features in exactly that schema; the CLI wrapper is
scripts/extract_features.py and the serving pipeline's ``caption_images``
uses them directly for raw-image captioning.

  - ``HFViTBackbone``: locally-cached HuggingFace Flax ViT, patch
    embeddings average-pooled to a g x g grid (runs through JAX).
  - ``PatchBackbone``: offline deterministic fallback (8x8 RGB cell
    thumbnails through a fixed random projection) — schema-correct for
    pipeline tests and smoke runs, not a semantic extractor.
  - ``roi_pool``: DLCT-style region features by pooling the grid feature
    map over externally-supplied boxes (the Faster-RCNN role; training a
    detector is out of scope).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def grid_boxes(g: int) -> np.ndarray:
    """Normalized (x1, y1, x2, y2) for a g x g grid, row-major."""
    edges = np.linspace(0.0, 1.0, g + 1, dtype=np.float32)
    boxes = np.empty((g * g, 4), np.float32)
    for row in range(g):
        for col in range(g):
            boxes[row * g + col] = (
                edges[col], edges[row], edges[col + 1], edges[row + 1]
            )
    return boxes


class PatchBackbone:
    """Deterministic offline extractor: 8x8 RGB thumbnails x fixed proj."""

    def __init__(self, grid: int, dim: int = 512):
        self.grid = grid
        self.dim = dim
        rng = np.random.default_rng(0)
        self.proj = rng.normal(size=(8 * 8 * 3, dim)).astype(np.float32)
        self.proj /= np.sqrt(8 * 8 * 3)

    def __call__(self, image: Image.Image) -> np.ndarray:
        g = self.grid
        arr = np.asarray(
            image.convert("RGB").resize((8 * g, 8 * g), Image.BILINEAR),
            np.float32,
        ) / 255.0
        cells = arr.reshape(g, 8, g, 8, 3).transpose(0, 2, 1, 3, 4)
        flat = cells.reshape(g * g, 8 * 8 * 3)
        return flat @ self.proj


class HFViTBackbone:
    """Locally-cached Flax ViT; patch embeddings pooled to the grid."""

    def __init__(self, model_name: str, grid: int):
        import jax

        from transformers import AutoImageProcessor, FlaxViTModel

        try:
            self.processor = AutoImageProcessor.from_pretrained(
                model_name, local_files_only=True
            )
            self.model = FlaxViTModel.from_pretrained(
                model_name, local_files_only=True
            )
        except Exception as e:
            raise RuntimeError(
                f"HF backbone {model_name!r} is not in the local cache "
                f"({e}).  Pre-seed the HF cache (offline environments have "
                "no network egress) or use the 'patch' backbone."
            ) from e
        self.grid = grid
        self._apply = jax.jit(
            lambda pixel_values: self.model(pixel_values).last_hidden_state
        )

    def __call__(self, image: Image.Image) -> np.ndarray:
        inputs = self.processor(image.convert("RGB"), return_tensors="np")
        hidden = np.asarray(self._apply(inputs["pixel_values"]))[0, 1:]  # drop CLS
        p = int(np.sqrt(hidden.shape[0]))
        fmap = hidden.reshape(p, p, -1)
        g = self.grid
        if g == p:
            return fmap.reshape(g * g, -1)
        # average-pool p x p patches to g x g cells
        out = np.empty((g, g, fmap.shape[-1]), np.float32)
        edges = np.linspace(0, p, g + 1).round().astype(int)
        for r in range(g):
            for c in range(g):
                cell = fmap[edges[r]:max(edges[r + 1], edges[r] + 1),
                            edges[c]:max(edges[c + 1], edges[c] + 1)]
                out[r, c] = cell.mean(axis=(0, 1))
        return out.reshape(g * g, -1)


def roi_pool(
    fmap: np.ndarray, gboxes: np.ndarray, boxes: np.ndarray
) -> np.ndarray:
    """Mean-pool grid cells whose boxes overlap each region box."""
    out = np.empty((len(boxes), fmap.shape[-1]), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        ix1 = np.maximum(gboxes[:, 0], x1)
        iy1 = np.maximum(gboxes[:, 1], y1)
        ix2 = np.minimum(gboxes[:, 2], x2)
        iy2 = np.minimum(gboxes[:, 3], y2)
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        if inter.max() <= 0:  # degenerate box: nearest cell by center
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            centers = (gboxes[:, :2] + gboxes[:, 2:]) / 2
            sel = np.argmin(((centers - [cx, cy]) ** 2).sum(-1))
            out[i] = fmap[sel]
        else:
            w = inter / inter.sum()
            out[i] = (fmap * w[:, None]).sum(0)
    return out




def make_backbone(spec: str, grid: int, dim: int = 512):
    """Backbone from a spec string: "patch" or "hf:<model-name>"."""
    if spec == "patch":
        return PatchBackbone(grid, dim)
    if spec.startswith("hf:"):
        return HFViTBackbone(spec[3:], grid)
    raise ValueError(f"unknown backbone {spec!r}")


def extract_feature_dict(image, backbone, gboxes, boxes=None):
    """One image -> the ``.npy`` payload dict the datasets read."""
    fmap = backbone(image).astype(np.float32)
    payload = {"grid_features": fmap, "grid_boxes": gboxes}
    if boxes is not None and len(boxes):
        payload["region_features"] = roi_pool(fmap, gboxes, boxes)
        payload["region_boxes"] = np.asarray(boxes, np.float32)
    return payload
