"""Generate the nine reference-parity YAML configs + fixed rstnet/dlct.

The YAML key trees ARE the public API surface (SURVEY.md §2.4): all nine
reference file names must parse and build.  ``rstnet.yaml`` and
``dlct-transformer.yaml`` reproduce the *broken-as-shipped* reference
shapes (trainer/architecture typos, BATCH_SIZE key) — the loader +
registry aliases make them load anyway — while ``rstnet_fixed.yaml`` and
``dlct_fixed.yaml`` actually wire AdaptiveDecoder + language model and
DualCollaborativeLevelEncoder + GeometricDualFeatureEmbedding.
"""

from __future__ import annotations

import copy
import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "configs")


def attention(arch="ScaledDotProductAttention", aoa=False, stateful=False,
              d_feature=2048, memory=None, head=8):
    node = {
        "ARCHITECTURE": arch,
        "HEAD": head,
        "D_MODEL": 512,
        "D_KEY": 64,
        "D_VALUE": 64,
        "D_FF": 2048,
        "D_FEATURE": d_feature,
        "USE_AOA": aoa,
        "CAN_BE_STATEFUL": stateful,
        "DROPOUT": 0.1,
    }
    if memory is not None:
        node["MEMORY"] = memory
    return node


def base(name, dataset="OpenViIC"):
    if dataset == "OpenViIC":
        json_path = {
            "TRAIN": "features/OpenViIC/annotations/uit-openviic-train.json",
            "DEV": "features/OpenViIC/annotations/uit-openviic-dev.json",
            "TEST": "features/OpenViIC/annotations/uit-openviic-test.json",
        }
        feature_path = {
            "FEATURES": "features/OpenViIC/features/x152++_faster_rcnn",
            "SCENE_TEXT": None,
            "IMAGE": None,
        }
    else:  # UIT-ViIC
        json_path = {
            "TRAIN": "features/UIT-ViIC/annotations/uitviic_captions_train2017.json",
            "DEV": "features/UIT-ViIC/annotations/uitviic_captions_val2017.json",
            "TEST": "features/UIT-ViIC/annotations/uitviic_captions_test2017.json",
        }
        feature_path = {
            "FEATURES": "features/UIT-ViIC/features/faster_rcnn_x152++",
            "IMAGE": None,
        }
    return {
        "TRAINER": "viTrainer",
        "DATASET": {
            "FEATURE_BATCH_SIZE": 60,
            "DICT_BATCH_SIZE": 60,
            "WORKERS": 2,
            "MIN_FREQ": 5,
            "SCENE_TEXT_THRESHOLD": 0.3,
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
            "JSON_PATH": json_path,
            "FEATURE_PATH": feature_path,
        },
        "TRAINING": {
            "CHECKPOINT_PATH": "saved_models",
            "LEARNING_RATE": 1.0,
            "RL_LEARNING_RATE": 0.000005,
            "WARMUP": 10000,
            "SCORE": "CIDEr",
            "GET_SCORES": True,
            "TRAINING_BEAM_SIZE": 5,
            "EVALUATING_BEAM_SIZE": 3,
            "PATIENCE": 5,
        },
        "MODEL": {
            "ARCHITECTURE": "StandardTransformerUsingRegion",
            "NAME": name,
            "DEVICE": "tpu",
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": 1024,
                "D_MODEL": 512,
                "DROPOUT": 0.1,
            },
            "ENCODER": {
                "ARCHITECTURE": "Encoder",
                "D_MODEL": 512,
                "LAYERS": 3,
                "SELF_ATTENTION": attention(memory=40),
            },
            "DECODER": {
                "ARCHITECTURE": "Decoder",
                "D_MODEL": 512,
                "LAYERS": 3,
                "ATTENTION": {
                    "SELF_ATTENTION": attention(stateful=True),
                    "ENC_ATTENTION": attention(),
                },
                "TEXT_EMBEDDING": {
                    "ARCHITECTURE": "UsualEmbedding",
                    "D_MODEL": 512,
                    "D_EMBEDDING": 300,
                    "WORD_EMBEDDING": None,
                    "WORD_EMBEDDING_CACHE": None,
                    "DROPOUT": 0.1,
                },
            },
        },
    }


def gen():
    configs = {}

    # 1. standard_transformer.yaml (region features, despite the file name)
    configs["standard_transformer"] = base("transformer_region_x152++")

    # 2. standard_transformer_using_region.yaml
    c = base("transformer_region_x152_faster_rcnn")
    configs["standard_transformer_using_region"] = c

    # 3. attention_on_attention.yaml
    c = base("aoa_region_x152++")
    c["DATASET"]["DICT_BATCH_SIZE"] = 30
    c["DATASET"]["MIN_FREQ"] = 1
    enc = c["MODEL"]["ENCODER"]["SELF_ATTENTION"]
    enc["USE_AOA"] = True
    c["MODEL"]["DECODER"]["ATTENTION"]["SELF_ATTENTION"]["USE_AOA"] = True
    c["MODEL"]["DECODER"]["ATTENTION"]["ENC_ATTENTION"]["USE_AOA"] = True
    configs["attention_on_attention"] = c

    # 4. augmented_memory_transformer.yaml (M2 attention in a std encoder)
    c = base("aug_mem_region_x152++")
    c["DATASET"]["DICT_BATCH_SIZE"] = 30
    c["DATASET"]["MIN_FREQ"] = 1
    c["MODEL"]["ARCHITECTURE"] = "MeshedMemoryTransformer"
    c["MODEL"]["ENCODER"]["SELF_ATTENTION"]["ARCHITECTURE"] = (
        "AugmentedMemoryScaledDotProductAttention"
    )
    c["MODEL"]["DECODER"]["ATTENTION"]["N_ENCODER_LAYERS"] = 3
    c["MODEL"]["DECODER"]["ATTENTION"]["D_MODEL"] = 512
    configs["augmented_memory_transformer"] = c

    # 5. meshed_memory_transformer.yaml
    c = base("m2_region_x152++")
    c["DATASET"]["MIN_FREQ"] = 1
    c["MODEL"]["ARCHITECTURE"] = "MeshedMemoryTransformer"
    c["MODEL"]["ENCODER"]["ARCHITECTURE"] = "MultilevelEncoder"
    c["MODEL"]["ENCODER"]["SELF_ATTENTION"]["ARCHITECTURE"] = (
        "AugmentedMemoryScaledDotProductAttention"
    )
    c["MODEL"]["DECODER"]["ARCHITECTURE"] = "MeshedDecoder"
    c["MODEL"]["DECODER"]["ATTENTION"]["N_ENCODER_LAYERS"] = 3
    c["MODEL"]["DECODER"]["ATTENTION"]["D_MODEL"] = 512
    configs["meshed_memory_transformer"] = c

    # 6. object_relation_transformer.yaml
    c = base("ort_region_x152++")
    c["DATASET"]["WORKERS"] = 0
    c["DATASET"]["MIN_FREQ"] = 1
    c["MODEL"]["ARCHITECTURE"] = "ObjectRelationTransformer"
    c["MODEL"]["ENCODER"]["ARCHITECTURE"] = "GeometricEncoder"
    c["MODEL"]["ENCODER"]["TRIGNOMETRIC_EMBEDDING"] = False
    sa = attention("AugmentedGeometryScaledDotProductAttention")
    del sa["D_FEATURE"]
    c["MODEL"]["ENCODER"]["SELF_ATTENTION"] = sa
    for key in ("SELF_ATTENTION", "ENC_ATTENTION"):
        c["MODEL"]["DECODER"]["ATTENTION"][key].pop("D_FEATURE", None)
    configs["object_relation_transformer"] = c

    # 7. camo_transformer.yaml
    c = base("camo_transformer_region_x152_faster_rcnn")
    c["MODEL"]["ARCHITECTURE"] = "CamoTransformer"
    c["MODEL"]["ENCODER"]["ARCHITECTURE"] = "CrossAttentionMultiLevelEncoder"
    c["MODEL"]["ENCODER"]["SELF_ATTENTION"]["HEAD"] = 1
    configs["camo_transformer"] = c

    # 8/9. rstnet.yaml & dlct-transformer.yaml — broken-as-shipped shapes
    # (trainer name 'ViTrainer', architecture typo, BATCH_SIZE key; see
    # reference configs/rstnet.yaml:1,4,36) — resolvable via loader defaults
    # + registry aliases.
    broken = base("standard_transformer_region_x152++", dataset="UIT-ViIC")
    broken["TRAINER"] = "ViTrainer"
    ds = broken["DATASET"]
    del ds["FEATURE_BATCH_SIZE"], ds["DICT_BATCH_SIZE"], ds["SCENE_TEXT_THRESHOLD"]
    ds["BATCH_SIZE"] = 20
    ds["MIN_FREQ"] = 1
    broken["TRAINING"].pop("SCORE")
    broken["TRAINING"]["GET_SCORES"] = False
    broken["MODEL"]["ARCHITECTURE"] = "StandardStranformerUsingRegion"
    broken["MODEL"]["ENCODER"]["SELF_ATTENTION"].pop("MEMORY")
    configs["rstnet"] = broken
    configs["dlct-transformer"] = copy.deepcopy(broken)

    # 10. rstnet_fixed.yaml — actually wires AdaptiveDecoder + language model
    c = base("rstnet_region_x152++", dataset="UIT-ViIC")
    c["DATASET"]["MIN_FREQ"] = 1
    dec = c["MODEL"]["DECODER"]
    dec["ARCHITECTURE"] = "AdaptiveDecoder"
    dec["ADAPTIVE_ATTENTION"] = {
        "SELF_ATTENTION": attention(
            "AdaptiveScaledDotProductAttention", stateful=True
        ),
        "ENC_ATTENTION": attention("AdaptiveScaledDotProductAttention"),
    }
    dec["LANGUAGE_MODEL"] = {
        "ARCHITECTURE": "PhoBERTModel",
        "PRETRAINED_NAME": "vinai/phobert-base",
        "HIDDEN_SIZE": 768,
        "D_MODEL": 512,
        "MAX_LEN": 54,
        "VOCAB_SIZE": 64001,
        "PADDING_IDX": 0,
        "BACKBONE_LAYERS": 2,
        "BACKBONE_HEADS": 8,
        "ATTENTION": attention(),
    }
    configs["rstnet_fixed"] = c

    # 11. dlct_fixed.yaml — DualCollaborativeLevelEncoder + geometric masks
    c = base("dlct_region_grid_x152++", dataset="UIT-ViIC")
    c["DATASET"]["MIN_FREQ"] = 1
    c["MODEL"]["ARCHITECTURE"] = "DLCTTransformer"
    c["MODEL"]["VISION_EMBEDDING"] = {
        "ARCHITECTURE": "GeometricDualFeatureEmbedding",
        "D_REGION_FEATURE": 1024,
        "D_GRID_FEATURE": 2048,
        "D_MODEL": 512,
        "DROPOUT": 0.1,
    }
    c["MODEL"]["ENCODER"] = {
        "ARCHITECTURE": "DualCollaborativeLevelEncoder",
        "D_MODEL": 512,
        "LAYERS": 3,
        "HEAD": 8,
        "TRIGNOMETRIC_EMBEDDING": True,
        "SELF_ATTENTION": attention("AugmentedGeometryScaledDotProductAttention"),
        "CROSS_ATTENTION": attention("AugmentedGeometryScaledDotProductAttention"),
    }
    configs["dlct_fixed"] = c

    os.makedirs(OUT, exist_ok=True)
    for name, cfg in configs.items():
        path = os.path.join(OUT, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False, allow_unicode=True)
        print("wrote", path)

    gen_tpu_variants(configs)


# TPU-tuned settings measured in PERF.md — every value is a validated win
# on v5e, applied on top of the reference-parity configs (which stay
# untouched for bit-compatible comparisons):
#   RNG_IMPL rbg          +46% XE throughput (hardware PRNG dropout masks)
#   MIXED_PRECISION       bf16 matmuls w/ f32 accumulation (MXU native)
#   DECODE_DTYPE bfloat16 ~1.8x eval/SCST decode; token parity spot-checked
#   STEPS_PER_CALL 4      amortises host dispatch; numerics == 4 x 1 step
#   DICT_BATCH_SIZE 300   SCST at 60 images/step: ~2.7x reference's 12-image
#                         batches ("5x the images for 1.8x the latency")
#   MAX_REGIONS 100       one static padded shape -> one XLA compile
#                         (bottom-up x152 caps at 100 boxes; raise if your
#                         extraction emits more — overflow raises clearly)
#   CACHE_FEATURES 2000   host LRU over .npy feature dicts (~2k x ~1 MB)
#   DECODE_HEAD_KERNEL    fused vocab-head+lse+top-k Pallas kernel: +14-20%
#                         decode on-chip; 100% token-identical on the
#                         trained d512 checkpoint (PERF.md round 3)
_TPU_TUNING = {
    "DATASET": {
        "DICT_BATCH_SIZE": 300,
        "MAX_REGIONS": 100,
        "CACHE_FEATURES": 2000,
    },
    "TRAINING": {
        "RNG_IMPL": "rbg",
        "MIXED_PRECISION": True,
        "DECODE_DTYPE": "bfloat16",
        "STEPS_PER_CALL": 4,
        "DECODE_HEAD_KERNEL": True,
    },
}

_TPU_HEADER = """\
# TPU-tuned variant of configs/{name}.yaml — generated by
# scripts/gen_configs.py.  Same model/data tree; only the PERF.md-validated
# performance keys differ (see _TPU_TUNING there for the measured wins).
# The parity config remains the reference-bit-compatible baseline.
"""


def gen_tpu_variants(configs):
    # the two broken-as-shipped parity configs exist only to prove the
    # loader survives the reference's typos — no point tuning them
    skip = {"rstnet", "dlct-transformer"}
    out = os.path.join(OUT, "tpu")
    os.makedirs(out, exist_ok=True)
    for name, cfg in configs.items():
        if name in skip:
            continue
        tuned = copy.deepcopy(cfg)
        for section, keys in _TPU_TUNING.items():
            tuned.setdefault(section, {}).update(keys)
        tuned["MODEL"]["NAME"] = f"{tuned['MODEL']['NAME']}_tpu"
        path = os.path.join(out, f"{name}.yaml")
        with open(path, "w") as f:
            f.write(_TPU_HEADER.format(name=name))
            yaml.safe_dump(tuned, f, sort_keys=False, allow_unicode=True)
        print("wrote", path)


if __name__ == "__main__":
    gen()
