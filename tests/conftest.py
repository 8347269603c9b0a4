"""Test configuration: force an 8-device CPU mesh before JAX initialises.

Multi-chip sharding tests run on virtual CPU devices
(``xla_force_host_platform_device_count``) per SURVEY.md §4(d)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests run on a virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins import jax before this conftest runs, so the env var alone
# may be too late — force the platform through the config as well (works
# until the backend is first initialised).
import jax

jax.config.update("jax_platforms", "cpu")

import json
import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_dataset_dir(tmp_path_factory):
    """A synthetic ViIC-style dataset: annotation JSONs + feature .npy files."""
    root = tmp_path_factory.mktemp("tiny_viic")
    rng = np.random.default_rng(0)

    captions = [
        "một người đàn ông đang đi bộ trên đường phố",
        "hai đứa trẻ chơi bóng đá trên sân cỏ",
        "một con mèo nằm trên ghế sofa màu đỏ",
        "người phụ nữ đang nấu ăn trong bếp",
        "chiếc xe máy đỗ trước cửa nhà",
        "một người đàn ông đang chạy trên đường",
        "đứa trẻ đang chơi với con mèo",
        "người phụ nữ đi bộ trên sân",
    ]

    def make_split(name, image_ids, n_caps=2):
        images = [{"id": i, "file_name": f"img_{i}.jpg"} for i in image_ids]
        anns = []
        for i in image_ids:
            for c in range(n_caps):
                anns.append(
                    {
                        "image_id": i,
                        "caption": captions[(i + c) % len(captions)],
                    }
                )
        with open(root / f"{name}.json", "w") as f:
            json.dump({"images": images, "annotations": anns}, f)

    make_split("train", [0, 1, 2, 3])
    make_split("dev", [4, 5])
    make_split("test", [6, 7])

    feat_dir = root / "features"
    feat_dir.mkdir()
    for i in range(8):
        n_regions = int(rng.integers(3, 8))
        boxes = rng.uniform(0, 1, size=(n_regions, 4)).astype(np.float32)
        boxes[:, 2:] = np.minimum(boxes[:, :2] + boxes[:, 2:] * 0.5 + 0.05, 1.0)
        features = {
            "region_features": rng.normal(size=(n_regions, 13)).astype(np.float32),
            "region_boxes": boxes.astype(np.float32),
            "grid_features": rng.normal(size=(9, 11)).astype(np.float32),
            "grid_boxes": np.tile(
                np.array([[0.1, 0.1, 0.4, 0.4]], dtype=np.float32), (9, 1)
            ),
        }
        np.save(feat_dir / f"{i}.npy", features, allow_pickle=True)

    return root


def make_dataset_config(root):
    """DATASET config node pointing at the tiny synthetic dataset."""
    from openviic_tpu.config import ConfigNode

    return ConfigNode(
        {
            "FEATURE_BATCH_SIZE": 4,
            "DICT_BATCH_SIZE": 4,
            "WORKERS": 0,
            "MIN_FREQ": 1,
            "VOCAB": {
                "TOKENIZER": None,
                "WORD_EMBEDDING": None,
                "WORD_EMBEDDING_CACHE": None,
                "BOS_TOKEN": "<bos>",
                "EOS_TOKEN": "<eos>",
                "PAD_TOKEN": "<pad>",
                "UNK_TOKEN": "<unk>",
                "USE_MAPPING": False,
                "PRETRAINED_LANGUAGE_MODEL": None,
            },
            "JSON_PATH": {
                "TRAIN": str(root / "train.json"),
                "DEV": str(root / "dev.json"),
                "TEST": str(root / "test.json"),
            },
            "FEATURE_PATH": {
                "FEATURES": str(root / "features"),
                "SCENE_TEXT": None,
                "IMAGE": None,
            },
        }
    )


@pytest.fixture(scope="session")
def tiny_vocab(tiny_dataset_dir):
    from openviic_tpu.data import Vocab

    return Vocab(make_dataset_config(tiny_dataset_dir))
