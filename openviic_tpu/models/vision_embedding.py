"""Vision (visual-feature) embeddings.

Reference equivalents (models/modules/vision_embeddings.py):
 - ``FeatureEmbedding`` (vision_embeddings.py:7-20): linear projection
   D_FEATURE -> D_MODEL + dropout; the padding mask is derived from all-zero
   feature rows.
 - ``DualFeatureEmbedding`` (vision_embeddings.py:22-43): separate region /
   grid projections.
 - ``GeometricDualFeatureEmbedding`` (vision_embeddings.py:45-70): adds the
   DLCT region<->grid visibility masks.  The reference builds those with a
   Python double loop (models/utils.py:139-154); here the vectorised
   jnp/numpy version in models/geometry.py runs in one shot.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from openviic_tpu.builders import META_VISION_EMBEDDING
from openviic_tpu.models.geometry import get_combine_masks
from openviic_tpu.models.initializers import torch_linear_bias, torch_linear_kernel
from openviic_tpu.models.masks import generate_padding_mask


@META_VISION_EMBEDDING.register()
class FeatureEmbedding(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self.proj = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_FEATURE),
            name="proj",
        )
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)

    def __call__(self, features, train: bool = False):
        masks = generate_padding_mask(features, padding_idx=0)
        features = self.proj(features)
        features = self.dropout(features, deterministic=not train)
        return features, masks


@META_VISION_EMBEDDING.register()
class DualFeatureEmbedding(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self.region_proj = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_REGION_FEATURE),
            name="region_proj",
        )
        self.grid_proj = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_GRID_FEATURE),
            name="grid_proj",
        )
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)

    def __call__(self, region_features, grid_features, train: bool = False):
        region_masks = generate_padding_mask(region_features, padding_idx=0)
        grid_masks = generate_padding_mask(grid_features, padding_idx=0)
        region_features = self.dropout(
            self.region_proj(region_features), deterministic=not train
        )
        grid_features = self.dropout(
            self.grid_proj(grid_features), deterministic=not train
        )
        return (region_features, region_masks), (grid_features, grid_masks)


@META_VISION_EMBEDDING.register()
class GeometricDualFeatureEmbedding(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self.region_proj = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_REGION_FEATURE),
            name="region_proj",
        )
        self.grid_proj = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_GRID_FEATURE),
            name="grid_proj",
        )
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)

    def __call__(
        self, region_features, region_boxes, grid_features, grid_boxes,
        train: bool = False,
    ):
        region_masks = generate_padding_mask(region_features, padding_idx=0)
        grid_masks = generate_padding_mask(grid_features, padding_idx=0)

        grid_size = int(grid_boxes.shape[1] ** 0.5)
        n_regions = region_features.shape[1]
        n_grids = grid_features.shape[1]
        region2grid_masks = jnp.asarray(get_combine_masks(region_boxes, grid_size))
        if grid_size * grid_size != n_grids:
            # the loader bucket-pads variable-row streams to a multiple of
            # 8 (data/loader.py), so the grid stream can carry padding rows
            # past the square grid (49 -> 56); those rows are padding and
            # must be masked (True) in the visibility matrices
            region2grid_masks = jnp.pad(
                region2grid_masks,
                ((0, 0), (0, 0), (0, 0), (0, n_grids - grid_size * grid_size)),
                constant_values=True,
            )
        grid2region_masks = jnp.transpose(region2grid_masks, (0, 1, 3, 2))
        # The reference concatenates (bs,1,1,n_r) padding masks directly with
        # the (bs,1,n_r,n_g) visibility masks (vision_embeddings.py:62-63),
        # which cannot broadcast — a latent bug in its never-exercised DLCT
        # path.  Correct semantics: broadcast the key-padding mask over the
        # query dim first.
        region2all_masks = jnp.concatenate(
            [
                jnp.broadcast_to(
                    region_masks, region_masks.shape[:2] + (n_regions, n_regions)
                ),
                region2grid_masks,
            ],
            axis=-1,
        )
        grid2all_masks = jnp.concatenate(
            [
                grid2region_masks,
                jnp.broadcast_to(
                    grid_masks, grid_masks.shape[:2] + (n_grids, n_grids)
                ),
            ],
            axis=-1,
        )

        region_features = self.dropout(
            self.region_proj(region_features), deterministic=not train
        )
        grid_features = self.dropout(
            self.grid_proj(grid_features), deterministic=not train
        )
        return (
            (region_features, region_masks),
            (grid_features, grid_masks),
            (region2all_masks, grid2all_masks),
        )
