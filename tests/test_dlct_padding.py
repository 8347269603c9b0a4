"""DLCT dual-stream embedding under loader bucket padding (round-4 fix).

The native loader pads variable-row feature streams to a multiple of 8
(data/loader.py), so a 7x7 grid stream arrives as 56 rows, not 49 — the
GeometricDualFeatureEmbedding must pad its region<->grid visibility
masks to the padded grid length (padding rows masked) instead of
crashing in the concatenate (reference vision_embeddings.py:40-68 never
faces this because the torch path has no static-shape bucketing)."""

import jax
import jax.numpy as jnp
import numpy as np

from openviic_tpu.config import ConfigNode
from openviic_tpu.models.vision_embedding import GeometricDualFeatureEmbedding


def _cfg():
    return ConfigNode({
        "D_MODEL": 32,
        "D_REGION_FEATURE": 16,
        "D_GRID_FEATURE": 24,
        "DROPOUT": 0.0,
    })


def _inputs(n_grids: int, bs: int = 2, n_regions: int = 24):
    rng = np.random.default_rng(0)
    region_features = rng.normal(size=(bs, n_regions, 16)).astype(np.float32)
    region_boxes = rng.uniform(0, 1, size=(bs, n_regions, 4)).astype(np.float32)
    region_boxes[..., 2:] = np.minimum(region_boxes[..., :2] + 0.3, 1.0)
    g = 7
    grid_features = np.zeros((bs, n_grids, 24), np.float32)
    grid_features[:, : g * g] = rng.normal(size=(bs, g * g, 24))
    grid_boxes = np.zeros((bs, n_grids, 4), np.float32)
    grid_boxes[:, : g * g] = np.stack(
        [
            np.repeat(np.arange(g), g) / g,
            np.tile(np.arange(g), g) / g,
            (np.repeat(np.arange(g), g) + 1) / g,
            (np.tile(np.arange(g), g) + 1) / g,
        ],
        axis=-1,
    )[None]
    return region_features, region_boxes, grid_features, grid_boxes


def test_padded_grid_stream_builds_and_masks_padding():
    emb = GeometricDualFeatureEmbedding(_cfg())
    rf, rb, gf, gb = _inputs(n_grids=56)  # 49 real cells + 7 padding rows
    params = emb.init(jax.random.PRNGKey(0), rf, rb, gf, gb)
    (r_out, _), (g_out, g_masks), (r2all, g2all) = emb.apply(
        params, rf, rb, gf, gb
    )
    n_r, n_g = rf.shape[1], gf.shape[1]
    assert r_out.shape == (2, n_r, 32) and g_out.shape == (2, n_g, 32)
    assert r2all.shape == (2, 1, n_r, n_r + n_g)
    assert g2all.shape == (2, 1, n_g, n_r + n_g)
    # the 7 padding grid rows are masked (True) for every region query
    pad_cols = np.asarray(r2all)[..., n_r + 49 :]
    assert pad_cols.all(), "padding grid rows must be invisible to regions"
    # real grid cells remain reachable
    real_cols = np.asarray(r2all)[..., n_r : n_r + 49]
    assert not real_cols.all()


def test_exact_grid_matches_padded_prefix():
    """The padded stream's mask prefix must equal the unpadded stream's
    masks — padding only appends masked columns/rows."""
    emb = GeometricDualFeatureEmbedding(_cfg())
    rf, rb, gf56, gb56 = _inputs(n_grids=56)
    gf49, gb49 = gf56[:, :49], gb56[:, :49]
    params = emb.init(jax.random.PRNGKey(0), rf, rb, gf49, gb49)
    (_, _), (_, _), (r2all_49, g2all_49) = emb.apply(params, rf, rb, gf49, gb49)
    (_, _), (_, _), (r2all_56, g2all_56) = emb.apply(params, rf, rb, gf56, gb56)
    n_r = rf.shape[1]
    np.testing.assert_array_equal(
        np.asarray(r2all_56)[..., : n_r + 49], np.asarray(r2all_49)
    )
    np.testing.assert_array_equal(
        np.asarray(g2all_56)[:, :, :49, : n_r + 49], np.asarray(g2all_49)
    )
