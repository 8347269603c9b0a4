"""Feature-extraction recipe (scripts/extract_features.py): images ->
.npy dicts -> FeatureDataset -> model forward, fully offline."""

import json
import sys
import os

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from openviic_tpu.data.extraction import PatchBackbone, grid_boxes, roi_pool

from extract_features import main


@pytest.fixture(scope="module")
def image_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("images")
    rng = np.random.default_rng(0)
    ids = [10, 11, 12]
    images = []
    for i in ids:
        arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.jpg")
        images.append({"id": i, "file_name": f"img_{i}.jpg"})
    ann = {"images": images, "annotations": [
        {"image_id": i, "caption": "một con mèo"} for i in ids
    ]}
    with open(root / "ann.json", "w") as f:
        json.dump(ann, f)
    boxes = {str(i): [[0.0, 0.0, 0.5, 0.5], [16, 8, 48, 40]] for i in ids}
    with open(root / "boxes.json", "w") as f:
        json.dump(boxes, f)
    return root, ids


def test_grid_boxes_cover_unit_square():
    g = grid_boxes(3)
    assert g.shape == (9, 4)
    assert g.min() == 0.0 and g.max() == 1.0
    areas = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    np.testing.assert_allclose(areas.sum(), 1.0, atol=1e-6)


def test_patch_backbone_deterministic(image_corpus):
    root, ids = image_corpus
    img = Image.open(root / f"img_{ids[0]}.jpg")
    b = PatchBackbone(grid=5, dim=64)
    f1, f2 = b(img), b(img)
    assert f1.shape == (25, 64)
    np.testing.assert_array_equal(f1, f2)


def test_roi_pool_blends_overlapping_cells():
    fmap = np.eye(4, dtype=np.float32)  # 2x2 grid, one-hot features
    g = grid_boxes(2)
    pooled = roi_pool(fmap, g, np.asarray([[0.0, 0.0, 1.0, 0.5]], np.float32))
    # top half: cells 0 and 1 equally weighted
    np.testing.assert_allclose(pooled[0], [0.5, 0.5, 0.0, 0.0], atol=1e-6)
    # degenerate box falls back to nearest cell center
    tiny = roi_pool(fmap, g, np.asarray([[0.9, 0.9, 0.9, 0.9]], np.float32))
    np.testing.assert_allclose(tiny[0], [0, 0, 0, 1], atol=1e-6)


def test_cli_end_to_end_and_dataset_consume(image_corpus, tmp_path):
    root, ids = image_corpus
    out = tmp_path / "features"
    main([
        "--image-dir", str(root), "--annotations", str(root / "ann.json"),
        "--out", str(out), "--backbone", "patch", "--grid", "3",
        "--dim", "11",
        "--region-boxes", str(root / "boxes.json"), "--pixel-boxes",
    ])
    for i in ids:
        payload = np.load(out / f"{i}.npy", allow_pickle=True)[()]
        assert payload["grid_features"].shape == (9, 11)
        assert payload["grid_boxes"].shape == (9, 4)
        assert payload["region_features"].shape == (2, 11)
        assert payload["region_boxes"].max() <= 1.0  # pixel boxes normalized

    # consumed by the real data layer + a model forward
    from openviic_tpu.config import ConfigNode
    from openviic_tpu.data import Vocab
    from openviic_tpu.data.datasets import FeatureDataset
    from openviic_tpu.data.loader import DataLoader
    from tests.conftest import make_dataset_config

    cfg = make_dataset_config(root)
    cfg.JSON_PATH._data.update(
        TRAIN=str(root / "ann.json"), DEV=str(root / "ann.json"),
        TEST=str(root / "ann.json"),
    )
    cfg.FEATURE_PATH._data["FEATURES"] = str(out)
    vocab = Vocab(cfg)
    ds = FeatureDataset(str(root / "ann.json"), vocab, cfg)
    batch = next(iter(DataLoader(ds, batch_size=3)))
    arrays = batch.arrays()
    # 9 grid cells bucket-padded to a multiple of 8 by the loader
    assert arrays["grid_features"].shape == (3, 16, 11)

    import jax

    from openviic_tpu.builders import build_model
    from tests.helpers import model_config

    cfg_m = model_config(
        architecture="StandardTransformerUsingGrid", d_feature=11
    )
    model = build_model(cfg_m, vocab)
    batch = {
        "grid_features": arrays["grid_features"],
        "caption_tokens": arrays["caption_tokens"],
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    out_lp = model.apply(params, batch)
    assert np.all(np.isfinite(np.asarray(out_lp)))
