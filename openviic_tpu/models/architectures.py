"""Registered captioning architectures.

Reference equivalents (models/*.py — SURVEY.md #21): thin composition
shells over BaseTransformer differing only in how visual features reach the
encoder:

 - ``StandardTransformerUsingRegion`` / ``StandardTransformerUsingGrid``
   (standard_stransformer.py:10-76)
 - ``MeshedMemoryTransformer`` (meshed_memory_transformer.py:9-41)
 - ``ObjectRelationTransformer`` (object_relation_transformer.py:10-43) —
   the reference passes an Instance positionally into the geometric
   encoder's (features, boxes, mask) signature, which would crash; wired
   correctly here.
 - ``UnifiedTransformer`` (unified_transformer.py:21-55) — concatenates
   region feats + boxes + grid feats + boxes along the sequence axis, as
   the reference does (dimensionally dubious but kept for parity; it
   requires D_FEATURE to match both feature dims and 4).
 - ``CamoTransformer`` (camo_transformer.py:9-41)
 - ``DLCTTransformer`` (new, fixed wiring for the reference's
   DualCollaborativeLevelEncoder + GeometricDualFeatureEmbedding which no
   shipped reference config exercises — SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from openviic_tpu.builders import (
    META_ARCHITECTURE,
    build_decoder,
    build_encoder,
    build_vision_embedding,
)
from openviic_tpu.models.base import BaseTransformer


class _SingleStreamTransformer(BaseTransformer):
    """Common setup for architectures with one vision stream."""

    feature_key = "region_features"

    def setup(self):
        self.vision_embedding = build_vision_embedding(self.config.VISION_EMBEDDING)
        self.encoder = build_encoder(self.config.ENCODER)
        self.decoder = build_decoder(self.config.DECODER, self.vocab)

    def encoder_forward(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        vision_features = batch[type(self).feature_key]
        vision_features, vision_padding_mask = self.vision_embedding(
            vision_features, train=train
        )
        encoder_features = self.encoder(
            features=vision_features, padding_mask=vision_padding_mask, train=train
        )
        return encoder_features, vision_padding_mask


@META_ARCHITECTURE.register()
class StandardTransformerUsingRegion(_SingleStreamTransformer):
    feature_key = "region_features"


@META_ARCHITECTURE.register()
class StandardTransformerUsingGrid(_SingleStreamTransformer):
    feature_key = "grid_features"


@META_ARCHITECTURE.register()
class MeshedMemoryTransformer(_SingleStreamTransformer):
    feature_key = "region_features"


@META_ARCHITECTURE.register()
class CamoTransformer(_SingleStreamTransformer):
    feature_key = "region_features"


@META_ARCHITECTURE.register()
class ObjectRelationTransformer(BaseTransformer):
    def setup(self):
        self.vision_embedding = build_vision_embedding(self.config.VISION_EMBEDDING)
        self.encoder = build_encoder(self.config.ENCODER)
        self.decoder = build_decoder(self.config.DECODER, self.vocab)

    def encoder_forward(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        region_features = batch["region_features"]
        region_boxes = batch["region_boxes"]
        region_features, region_padding_mask = self.vision_embedding(
            region_features, train=train
        )
        encoder_features = self.encoder(
            features=region_features,
            boxes=region_boxes,
            padding_mask=region_padding_mask,
            train=train,
        )
        return encoder_features, region_padding_mask


@META_ARCHITECTURE.register()
class UnifiedTransformer(BaseTransformer):
    def setup(self):
        self.vision_embedding = build_vision_embedding(self.config.VISION_EMBEDDING)
        self.encoder = build_encoder(self.config.ENCODER)
        self.decoder = build_decoder(self.config.DECODER, self.vocab)

    def encoder_forward(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        vision_features = jnp.concatenate(
            [
                batch["region_features"],
                batch["region_boxes"],
                batch["grid_features"],
                batch["grid_boxes"],
            ],
            axis=1,
        )
        vision_features, vision_padding_mask = self.vision_embedding(
            vision_features, train=train
        )
        encoder_features = self.encoder(
            features=vision_features, padding_mask=vision_padding_mask, train=train
        )
        return encoder_features, vision_padding_mask


@META_ARCHITECTURE.register()
class DLCTTransformer(BaseTransformer):
    """Dual-level collaborative transformer (region + grid streams)."""

    def setup(self):
        self.vision_embedding = build_vision_embedding(self.config.VISION_EMBEDDING)
        self.encoder = build_encoder(self.config.ENCODER)
        self.decoder = build_decoder(self.config.DECODER, self.vocab)

    def encoder_forward(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        (
            (region_features, region_masks),
            (grid_features, grid_masks),
            (region2all_masks, grid2all_masks),
        ) = self.vision_embedding(
            batch["region_features"],
            batch["region_boxes"],
            batch["grid_features"],
            batch["grid_boxes"],
            train=train,
        )
        encoder_features, padding_mask = self.encoder(
            region_features=region_features,
            region_boxes=batch["region_boxes"],
            region_padding_mask=region_masks,
            region2all_mask=region2all_masks,
            grid_features=grid_features,
            grid_boxes=batch["grid_boxes"],
            grid_padding_mask=grid_masks,
            grid2all_mask=grid2all_masks,
            train=train,
        )
        return encoder_features, padding_mask
