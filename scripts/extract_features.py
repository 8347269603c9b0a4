"""Visual feature extraction CLI: raw images -> per-image ``.npy`` dicts.

The backbones live in ``openviic_tpu.data.extraction`` (see that module's
docstring for the schema and the DLCT-style ROI-pooled region recipe);
this script walks an image directory or a COCO-style annotations JSON and
writes one feature file per image, ready for ``FeatureDataset`` /
``DictionaryDataset`` (reference: data_utils/dataset.py:45-49).

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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openviic_tpu.data.extraction import (  # noqa: E402
    extract_feature_dict,
    grid_boxes,
    make_backbone,
)


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
    ap.add_argument("--grid-as-regions", action="store_true",
                    help="no box source: use the grid cells as region "
                         "boxes so region-consuming models get a region "
                         "stream (same fallback serving.caption_images "
                         "applies)")
    args = ap.parse_args(argv)

    try:
        backbone = make_backbone(args.backbone, args.grid, args.dim)
    except (ValueError, RuntimeError) as e:
        ap.error(str(e))

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
        boxes = region_boxes.get(str(image_id))
        if boxes is not None and args.pixel_boxes:
            w, h = image.size
            boxes = boxes / np.asarray([w, h, w, h], np.float32)
        if boxes is None and args.grid_as_regions:
            boxes = gboxes
        payload = extract_feature_dict(image, backbone, gboxes, boxes)
        np.save(os.path.join(args.out, f"{image_id}.npy"), payload,
                allow_pickle=True)
    print(f"wrote {len(entries)} feature files to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
