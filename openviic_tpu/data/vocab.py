"""Token vocabulary.

Behavioral parity with the reference ``Vocab`` (reference:
data_utils/vocab.py:12-177):

 - built by scanning the train+dev+test caption JSONs (the reference does
   include the test split — mild leakage, kept for parity and flagged here);
 - frequency-sorted with alphabetical tie-break (vocab.py:49-55);
 - specials ``<pad> <bos> <eos> <unk>`` occupy ids 0..3 (order from config);
 - ``max_caption_length`` = longest preprocessed caption + 2 (vocab.py:88-95);
 - ``encode_caption`` pads every caption to the global max length so batches
   are statically shaped (vocab.py:99 — this is what makes XLA-friendly
   fixed-shape batching free);
 - ``decode_caption`` drops specials and stops at ``<eos>`` (vocab.py:104-125).

This implementation is numpy-based (no torch).  The optional pretrained
word-embedding matrix and HF-special-token paths are supported; the
reference's broken ``USE_MAPPING`` branch (``token_encoder.ecoder`` typo at
vocab.py:75) is implemented *fixed*.
"""

from __future__ import annotations

import json
from collections import Counter, defaultdict
from typing import List, Optional, Sequence

import numpy as np

from openviic_tpu.data.preprocess import preprocess_caption


class Vocab:
    def __init__(self, config):
        self.tokenizer = config.VOCAB.TOKENIZER

        if config.VOCAB.get("PRETRAINED_LANGUAGE_MODEL") is not None:
            from transformers import AutoTokenizer

            token_encoder = AutoTokenizer.from_pretrained(
                config.VOCAB.PRETRAINED_LANGUAGE_MODEL
            )
            self.padding_token = token_encoder.pad_token
            self.bos_token = token_encoder.bos_token
            self.eos_token = token_encoder.eos_token
            self.unk_token = token_encoder.unk_token
        else:
            token_encoder = None
            self.padding_token = config.VOCAB.PAD_TOKEN
            self.bos_token = config.VOCAB.BOS_TOKEN
            self.eos_token = config.VOCAB.EOS_TOKEN
            self.unk_token = config.VOCAB.UNK_TOKEN

        self.make_vocab(
            [
                config.JSON_PATH.TRAIN,
                config.JSON_PATH.DEV,
                config.JSON_PATH.TEST,
            ]
        )
        counter = self.freqs.copy()
        min_freq = max(config.MIN_FREQ, 1)

        specials = [self.padding_token, self.bos_token, self.eos_token, self.unk_token]
        self.itos: List[str] = list(specials)
        for tok in specials:
            if tok in counter:
                del counter[tok]

        # Sort by frequency (desc), then alphabetically — identical to
        # reference vocab.py:49-55 (stable sort by key, then by -freq).
        words_and_frequencies = sorted(counter.items(), key=lambda tup: tup[0])
        words_and_frequencies.sort(key=lambda tup: tup[1], reverse=True)
        for word, freq in words_and_frequencies:
            if freq < min_freq:
                break
            self.itos.append(word)

        self.stoi = defaultdict()
        self.stoi.update({tok: i for i, tok in enumerate(self.itos)})

        self.padding_idx = self.stoi[self.padding_token]
        self.bos_idx = self.stoi[self.bos_token]
        self.eos_idx = self.stoi[self.eos_token]
        self.unk_idx = self.stoi[self.unk_token]

        self.specials = list(specials)

        if config.VOCAB.get("USE_MAPPING"):
            assert token_encoder is not None, (
                "Pretrained language model is required if using map for vocab"
            )
            self.mapping = defaultdict()
            self.mapping.update(
                {
                    ori_idx: token_encoder.convert_tokens_to_ids(token)
                    for ori_idx, token in enumerate(self.itos)
                }
            )
            # Reference vocab.py:72-78 (with its `.ecoder` typo fixed).
            self.mapping[self.padding_idx] = token_encoder.convert_tokens_to_ids(
                self.padding_token
            )
            self.mapping[self.bos_idx] = token_encoder.convert_tokens_to_ids(
                self.bos_token
            )
            self.mapping[self.eos_idx] = token_encoder.convert_tokens_to_ids(
                self.eos_token
            )
            self.mapping[self.unk_idx] = token_encoder.convert_tokens_to_ids(
                self.unk_token
            )
        else:
            self.mapping = None

        self.word_embeddings: Optional[np.ndarray] = None
        if config.VOCAB.get("WORD_EMBEDDING") is not None:
            from openviic_tpu.builders import build_word_embedding

            self.load_word_embeddings(build_word_embedding(config.VOCAB))

    # ------------------------------------------------------------------
    def make_vocab(self, json_dirs: Sequence[str]) -> None:
        self.freqs: Counter = Counter()
        self.max_caption_length = 0
        for json_dir in json_dirs:
            with open(json_dir) as f:
                json_data = json.load(f)
            for ann in json_data["annotations"]:
                caption = preprocess_caption(ann["caption"], self.tokenizer)
                self.freqs.update(caption)
                if len(caption) + 2 > self.max_caption_length:
                    self.max_caption_length = len(caption) + 2

    def encode_caption(self, caption: List[str]) -> np.ndarray:
        """Caption tokens -> fixed-length padded id vector (int32)."""
        vec = np.full((self.max_caption_length,), self.padding_idx, dtype=np.int32)
        for i, token in enumerate([self.bos_token] + caption + [self.eos_token]):
            vec[i] = self.stoi[token] if token in self.stoi else self.unk_idx
        return vec

    def decode_caption(self, caption_vecs: np.ndarray, join_words: bool = True):
        """Id matrix (bs, max_len) -> list of caption strings (or word lists).

        Drops special tokens and stops at ``<eos>`` — reference
        vocab.py:104-125 semantics (specials *inside* the caption are
        silently dropped; the loop breaks only on eos)."""
        captions = []
        for vec in np.asarray(caption_vecs):
            words = []
            for idx in vec.tolist():
                if self.itos[idx] not in self.specials:
                    words.append(self.itos[idx])
                if idx == self.eos_idx:
                    break
            caption = " ".join(words)
            captions.append(caption if join_words else caption.strip().split())
        return captions

    def load_word_embeddings(self, word_embeddings) -> None:
        if not isinstance(word_embeddings, list):
            word_embeddings = [word_embeddings]
        tot_dim = sum(embedding.dim for embedding in word_embeddings)
        self.word_embeddings = np.zeros((len(self), tot_dim), dtype=np.float32)
        for i, token in enumerate(self.itos):
            start_dim = 0
            for v in word_embeddings:
                end_dim = start_dim + v.dim
                self.word_embeddings[i, start_dim:end_dim] = v[token.strip()]
                start_dim = end_dim
            assert start_dim == tot_dim

    def extend(self, v: "Vocab", sort: bool = False) -> None:
        words = sorted(v.itos) if sort else v.itos
        for w in words:
            if w not in self.stoi:
                self.itos.append(w)
                self.stoi[w] = len(self.itos) - 1

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Vocab):
            return NotImplemented
        return (
            self.freqs == other.freqs
            and dict(self.stoi) == dict(other.stoi)
            and self.itos == other.itos
        )

    def __len__(self) -> int:
        return len(self.itos)
