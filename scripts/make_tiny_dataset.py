"""Generate a tiny synthetic ViIC-style dataset for smoke runs.

Writes annotation JSONs + per-image feature ``.npy`` files under
``tiny_dataset/`` (repo-relative), shaped like the real UIT-OpenViIC
features (Faster-RCNN regions D=1024, 7x7 grid D=2048)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

CAPTIONS = [
    "một người đàn ông đang đi bộ trên đường phố",
    "hai đứa trẻ chơi bóng đá trên sân cỏ",
    "một con mèo nằm trên ghế sofa màu đỏ",
    "người phụ nữ đang nấu ăn trong bếp",
    "chiếc xe máy đỗ trước cửa nhà",
    "một người đàn ông đang chạy trên đường",
    "đứa trẻ đang chơi với con mèo nhỏ",
    "người phụ nữ đi bộ trên sân cỏ xanh",
    "con chó chạy theo chiếc xe máy",
    "một nhóm người đứng trước cửa hàng",
]


def main(root: str = "tiny_dataset", n_images: int = 24, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "features"), exist_ok=True)

    ids = list(range(n_images))
    splits = {
        "train": ids[: n_images * 2 // 3],
        "dev": ids[n_images * 2 // 3 : n_images * 5 // 6],
        "test": ids[n_images * 5 // 6 :],
    }
    for name, split_ids in splits.items():
        data = {
            "images": [
                {"id": i, "file_name": f"img_{i}.jpg"} for i in split_ids
            ],
            "annotations": [
                {"image_id": i, "caption": CAPTIONS[(i + c) % len(CAPTIONS)]}
                for i in split_ids
                for c in range(2)
            ],
        }
        with open(os.path.join(root, f"{name}.json"), "w") as f:
            json.dump(data, f, ensure_ascii=False)

    for i in ids:
        n_regions = int(rng.integers(10, 40))
        boxes = rng.uniform(0, 1, size=(n_regions, 4)).astype(np.float32)
        boxes[:, 2:] = np.minimum(boxes[:, :2] + 0.05 + boxes[:, 2:] * 0.4, 1.0)
        features = {
            "region_features": rng.normal(size=(n_regions, 1024)).astype(np.float32),
            "region_boxes": boxes,
            "grid_features": rng.normal(size=(49, 2048)).astype(np.float32),
            "grid_boxes": np.stack(
                [
                    np.repeat(np.arange(7), 7) / 7,
                    np.tile(np.arange(7), 7) / 7,
                    (np.repeat(np.arange(7), 7) + 1) / 7,
                    (np.tile(np.arange(7), 7) + 1) / 7,
                ],
                axis=-1,
            ).astype(np.float32),
        }
        np.save(os.path.join(root, "features", f"{i}.npy"), features, allow_pickle=True)
    print(f"tiny dataset written to {root}/ ({n_images} images)")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["tiny_dataset"]))
