"""Shared test helpers: tiny model configs mirroring the reference YAML keys."""

from __future__ import annotations

from openviic_tpu.config import ConfigNode

D_MODEL = 16
HEAD = 2
D_FF = 32


def attention_config(
    architecture="ScaledDotProductAttention",
    can_be_stateful=False,
    use_aoa=False,
    memory=4,
):
    return {
        "ARCHITECTURE": architecture,
        "HEAD": HEAD,
        "D_MODEL": D_MODEL,
        "D_KEY": D_MODEL // HEAD,
        "D_VALUE": D_MODEL // HEAD,
        "D_FF": D_FF,
        "D_FEATURE": D_FF,
        "MEMORY": memory,
        "USE_AOA": use_aoa,
        "CAN_BE_STATEFUL": can_be_stateful,
        "DROPOUT": 0.1,
    }


def model_config(
    architecture="StandardTransformerUsingRegion",
    encoder="Encoder",
    decoder="Decoder",
    enc_attention="ScaledDotProductAttention",
    use_aoa=False,
    d_feature=13,
    layers=2,
    trignometric=True,
):
    return ConfigNode(
        {
            "ARCHITECTURE": architecture,
            "NAME": "tiny_test_model",
            "DEVICE": "cpu",
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": d_feature,
                "D_MODEL": D_MODEL,
                "DROPOUT": 0.1,
            },
            "ENCODER": {
                "ARCHITECTURE": encoder,
                "D_MODEL": D_MODEL,
                "LAYERS": layers,
                "TRIGNOMETRIC_EMBEDDING": trignometric,
                "SELF_ATTENTION": attention_config(enc_attention, use_aoa=use_aoa),
            },
            "DECODER": {
                "ARCHITECTURE": decoder,
                "D_MODEL": D_MODEL,
                "LAYERS": layers,
                "ATTENTION": {
                    "D_MODEL": D_MODEL,
                    "N_ENCODER_LAYERS": layers,
                    "SELF_ATTENTION": attention_config(can_be_stateful=True),
                    "ENC_ATTENTION": attention_config(),
                },
                "TEXT_EMBEDDING": {
                    "ARCHITECTURE": "UsualEmbedding",
                    "D_MODEL": D_MODEL,
                    "D_EMBEDDING": 10,
                    "WORD_EMBEDDING": None,
                    "WORD_EMBEDDING_CACHE": None,
                    "DROPOUT": 0.1,
                },
            },
        }
    )
