"""Visual feature extraction: raw images -> per-image ``.npy`` feature dicts.

The reference consumes *pre-extracted* features and ships no extractor
(SURVEY.md overview; data_utils/dataset.py:45-49 just loads
``{image_id}.npy``).  This script completes that data story: it produces
feature files in exactly the schema the datasets read —

    {"grid_features": (g*g, d) f32, "grid_boxes": (g*g, 4) f32,
     ["region_features": (r, d) f32, "region_boxes": (r, 4) f32]}

Backbones:
  --backbone hf:<model>   a locally-cached HuggingFace Flax ViT (e.g.
                          ``hf:google/vit-base-patch16-224-in21k``); patch
                          embeddings average-pooled to the requested grid.
                          Runs through JAX (TPU when available).  Requires
                          the weights to already be in the local HF cache
                          (this environment has no network egress).
  --backbone patch        offline deterministic fallback: 8x8 RGB cell
                          thumbnails through a fixed random projection.
                          Shape- and schema-correct for pipeline tests and
                          smoke runs; not a semantic feature extractor.

Region features (the Faster-RCNN role) are produced by ROI-pooling the
grid feature map over externally-provided boxes (``--region-boxes``: JSON
{image_id: [[x1,y1,x2,y2], ...]} in pixels or normalized) — the DLCT-style
"regions from the grid map" recipe.  Training a detector is out of scope.

Examples:
  python scripts/extract_features.py --annotations data/train.json \
      --image-dir data/images --out data/features --backbone patch
  python scripts/extract_features.py --image-dir imgs --out feats \
      --backbone hf:google/vit-base-patch16-224-in21k --grid 7
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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
            raise SystemExit(
                f"HF backbone {model_name!r} is not in the local cache "
                f"({e}).  This environment has no network egress; pre-seed "
                "the cache or use --backbone patch."
            )
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


def list_images(args) -> list:
    """[(image_id, path)] from annotations JSON or a directory scan."""
    if args.annotations:
        with open(args.annotations) as f:
            data = json.load(f)
        return [
            (img["id"], os.path.join(args.image_dir, img["file_name"]))
            for img in data["images"]
        ]
    entries = []
    for name in sorted(os.listdir(args.image_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        image_id = int(stem) if stem.isdigit() else stem
        entries.append((image_id, os.path.join(args.image_dir, name)))
    return entries


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--annotations", help="COCO-style JSON with images[]")
    ap.add_argument("--backbone", default="patch",
                    help="'patch' or 'hf:<model-name>'")
    ap.add_argument("--grid", type=int, default=7)
    ap.add_argument("--dim", type=int, default=512,
                    help="feature dim for the patch backbone")
    ap.add_argument("--region-boxes",
                    help="JSON {image_id: [[x1,y1,x2,y2], ...]}")
    ap.add_argument("--pixel-boxes", action="store_true",
                    help="region boxes are in pixels (default: normalized)")
    args = ap.parse_args(argv)

    if args.backbone == "patch":
        backbone = PatchBackbone(args.grid, args.dim)
    elif args.backbone.startswith("hf:"):
        backbone = HFViTBackbone(args.backbone[3:], args.grid)
    else:
        ap.error(f"unknown backbone {args.backbone!r}")

    region_boxes = {}
    if args.region_boxes:
        with open(args.region_boxes) as f:
            region_boxes = {str(k): np.asarray(v, np.float32)
                            for k, v in json.load(f).items()}

    os.makedirs(args.out, exist_ok=True)
    gboxes = grid_boxes(args.grid)
    entries = list_images(args)
    for image_id, path in entries:
        image = Image.open(path)
        fmap = backbone(image).astype(np.float32)
        payload = {"grid_features": fmap, "grid_boxes": gboxes}
        boxes = region_boxes.get(str(image_id))
        if boxes is not None and len(boxes):
            if args.pixel_boxes:
                w, h = image.size
                boxes = boxes / np.asarray([w, h, w, h], np.float32)
            payload["region_features"] = roi_pool(fmap, gboxes, boxes)
            payload["region_boxes"] = boxes.astype(np.float32)
        np.save(os.path.join(args.out, f"{image_id}.npy"), payload,
                allow_pickle=True)
    print(f"wrote {len(entries)} feature files to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
