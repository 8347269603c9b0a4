"""Builder registries, one per module kind.

Equivalent of the reference's ``builders/`` package (one registry +
``build_*`` function per module kind, reference: builders/*.py — TRAINER,
ARCHITECTURE, ENCODER, DECODER, META_ATTENTION, TEXT_EMBEDDING,
META_VISION_EMBEDDING, WORD_EMBEDDING, PRETRAINED_LANGUAGE_MODEL).

Unlike the reference, building a model returns a Flax module + no device
placement (sharding is decided by the runtime layer, not the builder), and
the pretrained-language-model registry actually works (the reference's is
broken by a typo at builders/pretrained_language_model_builder.py:6)."""

from __future__ import annotations

from openviic_tpu.registry import Registry

META_TRAINER = Registry("TRAINER")
META_ARCHITECTURE = Registry("ARCHITECTURE")
META_ENCODER = Registry("ENCODER")
META_DECODER = Registry("DECODER")
META_ATTENTION = Registry("ATTENTION")
META_TEXT_EMBEDDING = Registry("TEXT_EMBEDDING")
META_VISION_EMBEDDING = Registry("VISION_EMBEDDING")
META_WORD_EMBEDDING = Registry("WORD_EMBEDDING")
META_PRETRAINED_LANGUAGE_MODEL = Registry("PRETRAINED_LANGUAGE_MODEL")

# Aliases resolving typos shipped in the reference's rstnet.yaml /
# dlct-transformer.yaml (SURVEY.md §2.4).
META_TRAINER.alias("ViTrainer", "viTrainer")
META_TRAINER.alias("EnTrainer", "enTrainer")
META_ARCHITECTURE.alias(
    "StandardStranformerUsingRegion", "StandardTransformerUsingRegion"
)


def _ensure_registered() -> None:
    """Import the module zoo so registration decorators have run.

    Lazy to avoid a circular import (models import the registries above)."""
    import openviic_tpu.data.word_embedding  # noqa: F401
    import openviic_tpu.models  # noqa: F401


def build_trainer(config):
    _ensure_registered()
    import openviic_tpu.training  # noqa: F401  (registers trainers)

    trainer_cls = META_TRAINER.get(config.TRAINER)
    return trainer_cls(config)


def build_model(config, vocab):
    _ensure_registered()
    model_cls = META_ARCHITECTURE.get(config.ARCHITECTURE)
    return model_cls(config=config, vocab=vocab)


def build_encoder(config):
    encoder_cls = META_ENCODER.get(config.ARCHITECTURE)
    return encoder_cls(config=config)


def build_decoder(config, vocab):
    decoder_cls = META_DECODER.get(config.ARCHITECTURE)
    return decoder_cls(config=config, vocab=vocab)


def build_attention(config):
    attention_cls = META_ATTENTION.get(config.ARCHITECTURE)
    return attention_cls(config=config)


def build_text_embedding(config, vocab):
    text_embedding_cls = META_TEXT_EMBEDDING.get(config.ARCHITECTURE)
    return text_embedding_cls(config=config, vocab=vocab)


def build_vision_embedding(config):
    vision_embedding_cls = META_VISION_EMBEDDING.get(config.ARCHITECTURE)
    return vision_embedding_cls(config=config)


def build_word_embedding(config):
    """Word embeddings may be a single name or a list of names (reference:
    builders/word_embedding_builder.py:5-14)."""
    _ensure_registered()
    name = config.WORD_EMBEDDING
    if name is None:
        return None
    if isinstance(name, (list, tuple)):
        return [
            META_WORD_EMBEDDING.get(n)(cache=config.WORD_EMBEDDING_CACHE) for n in name
        ]
    return META_WORD_EMBEDDING.get(name)(cache=config.WORD_EMBEDDING_CACHE)


def build_pretrained_language_model(config):
    _ensure_registered()
    lm_cls = META_PRETRAINED_LANGUAGE_MODEL.get(config.ARCHITECTURE)
    return lm_cls(config=config)
