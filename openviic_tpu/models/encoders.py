"""Encoder stacks.

Reference equivalents (models/modules/encoders.py):
 - ``Encoder``                        (encoders.py:24-40)
 - ``MultilevelEncoder``              (encoders.py:42-63) — returns all
   layer outputs stacked (bs, N, seq, d) for meshed decoding.
 - ``GeometricEncoder``               (encoders.py:65-112) — per-head
   ReLU(linear) over pairwise box-relation embeddings as attention bias.
 - ``DualCollaborativeLevelEncoder``  (encoders.py:114-211) — DLCT.
 - ``CrossAttentionMultiLevelEncoder``(encoders.py:213-248) — CAMO
   (hard-codes 3 layers like the reference, encoders.py:235).

The per-head geometry projections (h clones of Linear(d_g, 1), reference
encoders.py:80) are fused into a single Dense(d_g -> h) whose columns are
initialised like the individual Linear(d_g, 1) layers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import random

from openviic_tpu.builders import META_ENCODER
from openviic_tpu.models.attention import MultiHeadAttention
from openviic_tpu.models.ffn import make_pwff
from openviic_tpu.models.geometry import box_relational_embedding
from openviic_tpu.models.positional import sinusoid_positional_embedding


def _per_head_xavier(d_g: int):
    """Columns initialised as xavier_uniform of shape (d_g, 1)."""
    bound = float(np.sqrt(6.0 / (d_g + 1)))

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


class EncoderLayer(nn.Module):
    """One self-attention + FFN block; padded query rows zeroed afterwards
    (reference encoders.py:11-22)."""

    config: Any

    def setup(self):
        self.mhatt = MultiHeadAttention(self.config, name="mhatt")
        self.pwff = make_pwff(self.config, name="pwff")

    def __call__(self, queries, keys, values, padding_mask, attention_mask,
                 train: bool = False, **kwargs):
        att = self.mhatt(
            queries=queries, keys=keys, values=values,
            padding_mask=padding_mask, attention_mask=attention_mask,
            train=train, **kwargs,
        )
        ff = self.pwff(att, train=train)
        # zero padded query rows: padding_mask is (bs, 1, 1, len) over *queries*
        ff = jnp.where(padding_mask[:, 0, 0, :, None], 0.0, ff)
        return ff


@META_ENCODER.register()
class Encoder(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.layers = [
            EncoderLayer(cfg.SELF_ATTENTION, name=f"layer_{i}")
            for i in range(cfg.LAYERS)
        ]

    def __call__(self, features, padding_mask, train: bool = False):
        out = (
            self.layer_norm(features)
            + sinusoid_positional_embedding(features, self.d_model)
        ).astype(features.dtype)
        for layer in self.layers:
            out = layer(
                queries=out, keys=out, values=out,
                padding_mask=padding_mask, attention_mask=padding_mask, train=train,
            )
        return out


@META_ENCODER.register()
class MultilevelEncoder(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.layers = [
            EncoderLayer(cfg.SELF_ATTENTION, name=f"layer_{i}")
            for i in range(cfg.LAYERS)
        ]

    def __call__(self, features, padding_mask, train: bool = False):
        out = (
            self.layer_norm(features)
            + sinusoid_positional_embedding(features, self.d_model)
        ).astype(features.dtype)
        outs = []
        for layer in self.layers:
            out = layer(
                queries=out, keys=out, values=out,
                padding_mask=padding_mask, attention_mask=padding_mask, train=train,
            )
            outs.append(out)
        return jnp.stack(outs, axis=1)  # (bs, N, seq, d)


@META_ENCODER.register()
class GeometricEncoder(nn.Module):
    config: Any

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.trignometric_embedding = cfg.TRIGNOMETRIC_EMBEDDING
        self.n_heads = cfg.SELF_ATTENTION.HEAD
        self.d_g = (
            cfg.D_MODEL // self.n_heads if self.trignometric_embedding else 4
        )
        self.fc_gs = nn.Dense(
            self.n_heads,
            kernel_init=_per_head_xavier(self.d_g),
            bias_init=nn.initializers.zeros,
            name="fc_gs",
        )
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.layers = [
            EncoderLayer(cfg.SELF_ATTENTION, name=f"layer_{i}")
            for i in range(cfg.LAYERS)
        ]

    def geometry_weights(self, boxes):
        emb = box_relational_embedding(
            boxes, dim_g=self.d_g, trignometric_embedding=self.trignometric_embedding
        )  # (bs, n, n, d_g)
        w = self.fc_gs(emb)  # (bs, n, n, h)
        w = jnp.transpose(w, (0, 3, 1, 2))  # (bs, h, n, n)
        return jax.nn.relu(w)

    def __call__(self, features, boxes, padding_mask, train: bool = False):
        from openviic_tpu.ops.geo_attention import geo_fused_enabled

        geo_kwargs = {}
        if geo_fused_enabled() and self.trignometric_embedding and self.d_g % 8 == 0:
            # long-context path: the (bs, h, n, n) geometric bias is never
            # materialised — the attention kernel recomputes it from the
            # boxes in VMEM tiles (PERF.md long-context section)
            p = self.fc_gs.variables["params"]
            geo_kwargs["geometry_fused"] = {
                "boxes": boxes, "kernel": p["kernel"], "bias": p["bias"],
            }
        else:
            geo_kwargs["relative_geometry_weights"] = self.geometry_weights(boxes)
        out = (
            self.layer_norm(features)
            + sinusoid_positional_embedding(features, self.d_model)
        ).astype(features.dtype)
        for layer in self.layers:
            out = layer(
                queries=out, keys=out, values=out,
                padding_mask=padding_mask, attention_mask=padding_mask, train=train,
                **geo_kwargs,
            )
        return out


@META_ENCODER.register()
class DualCollaborativeLevelEncoder(nn.Module):
    """DLCT: parallel region & grid stacks + locally-constrained
    cross-attention over the concatenated sequence (encoders.py:114-211)."""

    config: Any

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.trignometric_embedding = cfg.TRIGNOMETRIC_EMBEDDING
        self.n_heads = cfg.HEAD
        self.d_g = cfg.D_MODEL // self.n_heads if self.trignometric_embedding else 4
        self.fc_gs = nn.Dense(
            self.n_heads,
            kernel_init=_per_head_xavier(self.d_g),
            bias_init=nn.initializers.zeros,
            name="fc_gs",
        )
        self.layer_norm_region = nn.LayerNorm(epsilon=1e-5, name="layer_norm_region")
        self.layer_norm_grid = nn.LayerNorm(epsilon=1e-5, name="layer_norm_grid")
        n = cfg.LAYERS
        self.layers_region = [
            EncoderLayer(cfg.SELF_ATTENTION, name=f"region_{i}") for i in range(n)
        ]
        self.layers_grid = [
            EncoderLayer(cfg.SELF_ATTENTION, name=f"grid_{i}") for i in range(n)
        ]
        self.region2grid = [
            EncoderLayer(cfg.CROSS_ATTENTION, name=f"region2grid_{i}") for i in range(n)
        ]
        self.grid2region = [
            EncoderLayer(cfg.CROSS_ATTENTION, name=f"grid2region_{i}") for i in range(n)
        ]

    def __call__(
        self,
        region_features, region_boxes, region_padding_mask, region2all_mask,
        grid_features, grid_boxes, grid_padding_mask, grid2all_mask,
        train: bool = False,
    ):
        n_regions = region_features.shape[1]

        boxes = jnp.concatenate([region_boxes, grid_boxes], axis=1)
        emb = box_relational_embedding(
            boxes, dim_g=self.d_g, trignometric_embedding=self.trignometric_embedding
        )
        g = jax.nn.relu(jnp.transpose(self.fc_gs(emb), (0, 3, 1, 2)))  # (bs,h,nk,nk)

        # The DLCT positional embedding is the normalized variant
        # (encoders.py:133 re-creates pos_embedding with normalize=True).
        def pos(x):
            return sinusoid_positional_embedding(x, self.d_model, normalize=True)

        region_features = (
            self.layer_norm_region(region_features) + pos(region_features)
        ).astype(region_features.dtype)
        grid_features = (
            self.layer_norm_grid(grid_features) + pos(grid_features)
        ).astype(grid_features.dtype)

        for l_region, l_grid, l_r2g, l_g2r in zip(
            self.layers_region, self.layers_grid, self.region2grid, self.grid2region
        ):
            region_features = l_region(
                queries=region_features, keys=region_features, values=region_features,
                relative_geometry_weights=g[:, :, :n_regions, :n_regions],
                padding_mask=region_padding_mask, attention_mask=region_padding_mask,
                train=train,
            )
            grid_features = l_grid(
                queries=grid_features, keys=grid_features, values=grid_features,
                relative_geometry_weights=g[:, :, n_regions:, n_regions:],
                padding_mask=grid_padding_mask, attention_mask=grid_padding_mask,
                train=train,
            )

            combined = jnp.concatenate([region_features, grid_features], axis=1)
            combined = combined + pos(combined)

            # attention over [regions|grids] is locally constrained by the
            # visibility masks; query-row zeroing uses the plain padding
            # masks (the reference passes the 4-D mask into masked_fill,
            # encoders.py:197-206 — unbroadcastable, latent bug; fixed here)
            region_features = l_r2g(
                queries=region_features, keys=combined, values=combined,
                relative_geometry_weights=g[:, :, :n_regions, :],
                padding_mask=region_padding_mask, attention_mask=region2all_mask,
                train=train,
            )
            grid_features = l_g2r(
                queries=grid_features, keys=combined, values=combined,
                relative_geometry_weights=g[:, :, n_regions:, :],
                padding_mask=grid_padding_mask, attention_mask=grid2all_mask,
                train=train,
            )

        out = jnp.concatenate([region_features, grid_features], axis=1)
        padding_mask = jnp.concatenate(
            [region_padding_mask, grid_padding_mask], axis=-1
        )
        return out, padding_mask


@META_ENCODER.register()
class CrossAttentionMultiLevelEncoder(nn.Module):
    """CAMO: 3-layer stack + weighted cross-layer attention + MLP fusion
    (encoders.py:213-248)."""

    config: Any

    def setup(self):
        cfg = self.config
        self.d_model = cfg.D_MODEL
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.layers = [
            EncoderLayer(cfg.SELF_ATTENTION, name=f"layer_{i}")
            for i in range(cfg.LAYERS)
        ]
        self.self_attn = MultiHeadAttention(cfg.SELF_ATTENTION, name="self_attn")
        from openviic_tpu.models.initializers import (
            torch_linear_bias,
            torch_linear_kernel,
        )

        self.mlp1 = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(3 * cfg.D_MODEL),
            name="mlp1",
        )
        self.mlp2 = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_MODEL),
            name="mlp2",
        )

    def __call__(self, features, padding_mask, train: bool = False):
        out = (
            self.layer_norm(features)
            + sinusoid_positional_embedding(features, self.d_model)
        ).astype(features.dtype)
        outs = []
        for layer in self.layers:
            out = layer(
                queries=out, keys=out, values=out,
                padding_mask=padding_mask, attention_mask=padding_mask, train=train,
            )
            outs.append(out)

        # the reference hard-codes 3 encoder layers here (encoders.py:235)
        out1, out2, out3 = outs

        out2 = 0.1 * self.self_attn(
            queries=out2, keys=out1, values=out1,
            padding_mask=padding_mask, attention_mask=padding_mask, train=train,
        ) + out2
        out3 = 0.1 * self.self_attn(
            queries=out3, keys=out2, values=out2,
            padding_mask=padding_mask, attention_mask=padding_mask, train=train,
        ) + out3

        out = self.mlp1(jnp.concatenate(outs, axis=-1))
        out = jax.nn.leaky_relu(out)
        out = self.mlp2(out)
        out = jax.nn.leaky_relu(out)

        return out3 + 0.2 * out
