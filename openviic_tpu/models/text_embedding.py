"""Text (token) embeddings.

Reference equivalents (models/modules/text_embeddings.py):
 - ``UsualEmbedding`` (text_embeddings.py:7-31).  The reference's
   pretrained-vector branch is buggy (``nn.Sequential(Linear, Dropout,
   Embedding)`` applies the Linear to raw ids — SURVEY.md §2.5#3); here the
   order is fixed: frozen pretrained embedding -> dropout -> linear
   projection to D_MODEL.
 - ``LSTMTextEmbedding`` (text_embeddings.py:33-57): embedding -> proj ->
   unidirectional LSTM.

Both return ``(features, (padding_mask, sequential_mask))``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from openviic_tpu.builders import META_TEXT_EMBEDDING, build_word_embedding
from openviic_tpu.models.initializers import (
    torch_embedding_init,
    torch_linear_bias,
    torch_linear_kernel,
)
from openviic_tpu.models.masks import generate_padding_mask, generate_sequential_mask


def _masked_embedding_init(padding_idx: int):
    def init(key, shape, dtype=jnp.float32):
        emb = torch_embedding_init(key, shape, dtype)
        return emb.at[padding_idx].set(0.0)

    return init


@META_TEXT_EMBEDDING.register()
class UsualEmbedding(nn.Module):
    config: Any
    vocab: Any

    def setup(self):
        cfg = self.config
        self.padding_idx = self.vocab.padding_idx
        self.use_pretrained = cfg.WORD_EMBEDDING is not None
        if not self.use_pretrained:
            self.embedding = nn.Embed(
                num_embeddings=len(self.vocab),
                features=cfg.D_MODEL,
                embedding_init=_masked_embedding_init(self.vocab.padding_idx),
                name="embedding",
            )
        else:
            if self.vocab.word_embeddings is not None:
                weights = jnp.asarray(self.vocab.word_embeddings)
            else:
                we = build_word_embedding(cfg)
                weights = jnp.asarray(we.vectors)
            self.pretrained_vectors = weights  # frozen: stored as a constant
            self.proj = nn.Dense(
                cfg.D_MODEL,
                kernel_init=torch_linear_kernel,
                bias_init=torch_linear_bias(cfg.D_EMBEDDING),
                name="proj",
            )
            self.dropout = nn.Dropout(rate=cfg.DROPOUT)

    def __call__(self, tokens, train: bool = False):
        padding_masks = generate_padding_mask(tokens, padding_idx=self.padding_idx)
        sequential_masks = generate_sequential_mask(tokens.shape[-1])
        if not self.use_pretrained:
            features = self.embedding(tokens)
        else:
            features = jnp.take(self.pretrained_vectors, tokens, axis=0)
            features = self.dropout(features, deterministic=not train)
            features = self.proj(features)
        return features, (padding_masks, sequential_masks)


@META_TEXT_EMBEDDING.register()
class LSTMTextEmbedding(nn.Module):
    config: Any
    vocab: Any

    def setup(self):
        cfg = self.config
        self.padding_idx = self.vocab.padding_idx
        if cfg.WORD_EMBEDDING is not None and self.vocab.word_embeddings is not None:
            weights = jnp.asarray(self.vocab.word_embeddings)
            self.embedding_table = weights
            self.frozen_embedding = True
        else:
            self.embedding = nn.Embed(
                num_embeddings=len(self.vocab),
                features=cfg.D_EMBEDDING,
                embedding_init=_masked_embedding_init(self.vocab.padding_idx),
                name="embedding",
            )
            self.frozen_embedding = False
        self.proj = nn.Dense(
            cfg.D_MODEL,
            kernel_init=torch_linear_kernel,
            bias_init=torch_linear_bias(cfg.D_EMBEDDING),
            name="proj",
        )
        self.dropout = nn.Dropout(rate=cfg.DROPOUT)
        self.lstm = nn.RNN(nn.OptimizedLSTMCell(features=cfg.D_MODEL), name="lstm")

    def __call__(self, tokens, train: bool = False):
        padding_masks = generate_padding_mask(tokens, padding_idx=self.padding_idx)
        sequential_masks = generate_sequential_mask(tokens.shape[-1])
        if self.frozen_embedding:
            features = jnp.take(self.embedding_table, tokens, axis=0)
        else:
            features = self.embedding(tokens)
        features = self.proj(features)
        features = self.dropout(features, deterministic=not train)
        features = self.lstm(features)
        return features, (padding_masks, sequential_masks)
