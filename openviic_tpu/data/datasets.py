"""Datasets over pre-extracted visual features.

Equivalents of the reference datasets (reference: data_utils/dataset.py):

 - ``FeatureDataset`` (dataset.py:13-72): one sample per *annotation* —
   encoded caption, shifted-right target, per-image ``.npy`` feature dict
   merged into the Instance; the eos token is removed from the decoder input
   (dataset.py:61).
 - ``DictionaryDataset`` (dataset.py:74-127): one sample per *image* —
   filename + all ground-truth captions + features; used for beam-search
   eval and SCST.
 - ``ImageDataset`` (dataset.py:129-147): cv2-loads images for
   visualization (the reference version references an undefined
   ``self.image_path`` — implemented fixed here via
   ``config.FEATURE_PATH.IMAGE``).

TPU-first notes: feature files are memory-mapped-on-read numpy dicts; the
image_id -> filename join is done with a dict (the reference does an O(n²)
nested scan at dataset.py:31-35).
"""

from __future__ import annotations

import collections
import json
import os
import threading
from typing import Any, Dict, List

import numpy as np

from openviic_tpu.data.instance import Instance
from openviic_tpu.data.preprocess import preprocess_caption


class _FeatureSource:
    """Loads per-image `.npy` feature dicts, converting to float32 arrays.

    ``cache_size`` > 0 keeps that many parsed dicts in an LRU (shared per
    features directory, so the six trainer datasets over one directory
    share hits).  Re-parsing every ``.npy`` each epoch is a measurable
    share of step time on weak hosts (PERF.md input-pipeline note);
    ``DATASET.CACHE_FEATURES: N`` bounds host RAM at ~N x feature-dict
    size.  Cached arrays are returned as-is — callers must not mutate."""

    _shared: Dict[str, dict] = {}

    def __init__(self, features_path: str, cache_size: int = 0):
        self.features_path = features_path
        cache_size = int(cache_size or 0)
        if cache_size > 0:
            # keyed by directory alone: sources with different configured
            # sizes share one cache bounded by the largest request, so RAM
            # stays at ~max(N) x dict size rather than the sum
            shared = _FeatureSource._shared.setdefault(
                os.path.abspath(features_path),
                {
                    "cache": collections.OrderedDict(),
                    "lock": threading.Lock(),
                    "size": 0,
                },
            )
            shared["size"] = max(shared["size"], cache_size)
            self._shared_entry = shared
            self._cache = shared["cache"]
            self._lock = shared["lock"]
        else:
            self._cache = None

    def load(self, image_id: int) -> Dict[str, Any]:
        if self._cache is not None:
            with self._lock:
                hit = self._cache.get(image_id)
                if hit is not None:
                    self._cache.move_to_end(image_id)
                    return hit
        feature_file = os.path.join(self.features_path, f"{image_id}.npy")
        features = np.load(feature_file, allow_pickle=True)[()]
        out = {}
        for key, value in features.items():
            arr = np.asarray(value)
            if arr.dtype in (np.float64, np.float16):
                arr = arr.astype(np.float32)
            out[key] = arr
        if self._cache is not None:
            with self._lock:
                self._cache[image_id] = out
                while len(self._cache) > self._shared_entry["size"]:
                    self._cache.popitem(last=False)
        return out


class FeatureDataset:
    """One sample per annotation; yields teacher-forcing inputs/targets."""

    def __init__(self, json_path: str, vocab, config) -> None:
        with open(json_path, "r") as f:
            json_data = json.load(f)
        self.vocab = vocab
        self.annotations = self.load_json(json_data)
        self.features = _FeatureSource(
            config.FEATURE_PATH.FEATURES, config.get("CACHE_FEATURES", 0)
        )

    def load_json(self, json_data: Dict) -> List[Dict]:
        id_to_filename = {img["id"]: img["file_name"] for img in json_data["images"]}
        annotations = []
        for ann in json_data["annotations"]:
            annotations.append(
                {
                    "caption": preprocess_caption(ann["caption"], self.vocab.tokenizer),
                    "image_id": ann["image_id"],
                    "filename": id_to_filename.get(ann["image_id"]),
                }
            )
        return annotations

    @property
    def captions(self) -> List[List[str]]:
        return [ann["caption"] for ann in self.annotations]

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        caption = self.vocab.encode_caption(item["caption"])

        # Target is the caption shifted right; input has eos replaced by pad
        # (reference dataset.py:58-61).
        shifted_right_caption = np.full_like(caption, self.vocab.padding_idx)
        shifted_right_caption[:-1] = caption[1:]
        caption = np.where(caption == self.vocab.eos_idx, self.vocab.padding_idx, caption)

        features = self.features.load(item["image_id"])
        return Instance(
            caption_tokens=caption.astype(np.int32),
            shifted_right_caption_tokens=shifted_right_caption.astype(np.int32),
            **features,
        )

    def __len__(self) -> int:
        return len(self.annotations)


class DictionaryDataset:
    """One sample per image with all its ground-truth captions."""

    def __init__(self, json_path: str, vocab, config) -> None:
        with open(json_path, "r") as f:
            json_data = json.load(f)
        self.vocab = vocab
        self.image_ids, self.filenames, self.captions_with_image = self.load_json(
            json_data
        )
        self.features = _FeatureSource(
            config.FEATURE_PATH.FEATURES, config.get("CACHE_FEATURES", 0)
        )

    def load_json(self, json_data: Dict):
        examples: Dict[int, List[str]] = {}
        filenames: Dict[int, str] = {}
        for image in json_data["images"]:
            examples[image["id"]] = []
            filenames[image["id"]] = image["file_name"]
        for ann in json_data["annotations"]:
            caption = preprocess_caption(ann["caption"], self.vocab.tokenizer)
            examples[ann["image_id"]].append(" ".join(caption))
        image_ids = list(examples.keys())
        captions_with_image = [examples[i] for i in image_ids]
        return image_ids, list(filenames.values()), captions_with_image

    def __getitem__(self, idx: int) -> Instance:
        image_id = self.image_ids[idx]
        features = self.features.load(image_id)
        return Instance(
            image_id=image_id,
            filename=self.filenames[idx],
            captions=self.captions_with_image[idx],
            **features,
        )

    def __len__(self) -> int:
        return len(self.image_ids)


class ImageDataset(DictionaryDataset):
    """Loads raw images alongside features, for visualization."""

    def __init__(self, json_path: str, vocab, config) -> None:
        super().__init__(json_path, vocab, config)
        self.image_path = config.FEATURE_PATH.IMAGE

    def __getitem__(self, idx: int) -> Instance:
        import cv2 as cv

        image_id = self.image_ids[idx]
        filename = self.filenames[idx]
        image_file = os.path.join(self.image_path, filename)
        image = cv.imread(image_file)
        image = cv.resize(image, (512, 512), interpolation=cv.INTER_AREA)
        features = self.features.load(image_id)
        return Instance(
            image_id=image_id,
            filename=filename,
            image=image,
            captions=self.captions_with_image[idx],
            **features,
        )
