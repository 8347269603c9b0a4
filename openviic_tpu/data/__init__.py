from openviic_tpu.data.preprocess import preprocess_caption, get_tokenizer
from openviic_tpu.data.vocab import Vocab
from openviic_tpu.data.instance import Instance, InstanceList
from openviic_tpu.data.datasets import FeatureDataset, DictionaryDataset, ImageDataset

__all__ = [
    "preprocess_caption",
    "get_tokenizer",
    "Vocab",
    "Instance",
    "InstanceList",
    "FeatureDataset",
    "DictionaryDataset",
    "ImageDataset",
]
