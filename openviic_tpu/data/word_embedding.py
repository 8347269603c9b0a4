"""Pretrained word embeddings (PhoW2V, fastText).

Reference equivalent: data_utils/word_embedding.py:31-252 — GloVe-format
vector files downloaded/cached to a binary cache, exposed per-token via
``__getitem__`` with a deterministic unk initialisation
(data_utils/utils.py:103-119: pad->0, bos->1, eos->2, other->3 vectors).

Registered names (SURVEY.md §2.4): PhoW2VSyllable100/300, PhoW2VWord100/
300, EnFastText, ViFastText.  Download is attempted only when a cache
miss occurs and the source URL is reachable; in offline environments a
clear error points at the expected cache location.
"""

from __future__ import annotations

import gzip
import os
import zipfile
from typing import Dict, Optional

import numpy as np

from openviic_tpu.builders import META_WORD_EMBEDDING
from openviic_tpu.utils import setup_logger

logger = setup_logger()


def unk_init(token: str, dim: int) -> np.ndarray:
    if token in ("<pad>", "<p>"):
        return np.zeros(dim, np.float32)
    if token in ("<sos>", "<bos>", "<s>"):
        return np.ones(dim, np.float32)
    if token in ("<eos>", "</s>"):
        return np.full(dim, 2.0, np.float32)
    return np.full(dim, 3.0, np.float32)


class WordEmbedding:
    """GloVe-format text vectors with an .npz binary cache."""

    url: Optional[str] = None
    filename: Optional[str] = None
    dim: int = 300

    def __init__(self, cache: Optional[str] = None):
        self.cache_dir = cache or os.path.expanduser("~/.cache/openviic_tpu/vectors")
        self.stoi: Dict[str, int] = {}
        self.vectors: Optional[np.ndarray] = None
        self._load()

    # -- loading --------------------------------------------------------
    def _cache_file(self) -> str:
        return os.path.join(self.cache_dir, f"{self.filename}.npz")

    def _source_file(self) -> str:
        return os.path.join(self.cache_dir, self.filename)

    def _load(self) -> None:
        cache_file = self._cache_file()
        if os.path.isfile(cache_file):
            data = np.load(cache_file, allow_pickle=True)
            self.vectors = data["vectors"].astype(np.float32)
            itos = list(data["itos"])
            self.stoi = {tok: i for i, tok in enumerate(itos)}
            return

        source = self._source_file()
        if not os.path.isfile(source):
            self._download(source)
        self._parse(source)
        os.makedirs(self.cache_dir, exist_ok=True)
        itos = [None] * len(self.stoi)
        for tok, i in self.stoi.items():
            itos[i] = tok
        np.savez_compressed(
            self._cache_file(), vectors=self.vectors, itos=np.asarray(itos, object)
        )

    def _download(self, dest: str) -> None:
        if self.url is None:
            raise FileNotFoundError(
                f"No cached vectors at {dest} and no source URL for "
                f"{type(self).__name__}"
            )
        import urllib.request

        os.makedirs(os.path.dirname(dest), exist_ok=True)
        logger.info("Downloading %s -> %s", self.url, dest)
        try:
            urllib.request.urlretrieve(self.url, dest)
        except Exception as e:
            raise FileNotFoundError(
                f"Could not download {self.url} ({e}).  Place the vector file "
                f"at {dest} manually (offline environment)."
            ) from e
        if dest.endswith(".zip"):
            with zipfile.ZipFile(dest) as zf:
                zf.extractall(os.path.dirname(dest))

    def _parse(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        vectors = []
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            first = f.readline()
            parts = first.rstrip().split(" ")
            # fastText-style header line: "<count> <dim>"
            if len(parts) == 2 and parts[0].isdigit():
                self.dim = int(parts[1])
            else:
                self._add_line(parts, vectors)
            for line in f:
                self._add_line(line.rstrip().split(" "), vectors)
        self.vectors = np.asarray(vectors, np.float32)

    def _add_line(self, parts, vectors) -> None:
        word = " ".join(parts[: len(parts) - self.dim])
        vec = [float(x) for x in parts[len(parts) - self.dim :]]
        if word in self.stoi:
            return
        self.stoi[word] = len(vectors)
        vectors.append(vec)

    # -- lookup ---------------------------------------------------------
    def __getitem__(self, token: str) -> np.ndarray:
        idx = self.stoi.get(token)
        if idx is None:
            return unk_init(token, self.dim)
        return self.vectors[idx]

    def __contains__(self, token: str) -> bool:
        return token in self.stoi

    def __len__(self) -> int:
        return len(self.stoi)


@META_WORD_EMBEDDING.register()
class PhoW2VSyllable100(WordEmbedding):
    url = "https://public.vinai.io/word2vec_vi_syllables_100dims.zip"
    filename = "word2vec_vi_syllables_100dims.txt"
    dim = 100


@META_WORD_EMBEDDING.register()
class PhoW2VSyllable300(WordEmbedding):
    url = "https://public.vinai.io/word2vec_vi_syllables_300dims.zip"
    filename = "word2vec_vi_syllables_300dims.txt"
    dim = 300


@META_WORD_EMBEDDING.register()
class PhoW2VWord100(WordEmbedding):
    url = "https://public.vinai.io/word2vec_vi_words_100dims.zip"
    filename = "word2vec_vi_words_100dims.txt"
    dim = 100


@META_WORD_EMBEDDING.register()
class PhoW2VWord300(WordEmbedding):
    url = "https://public.vinai.io/word2vec_vi_words_300dims.zip"
    filename = "word2vec_vi_words_300dims.txt"
    dim = 300


@META_WORD_EMBEDDING.register()
class EnFastText(WordEmbedding):
    url = "https://dl.fbaipublicfiles.com/fasttext/vectors-english/wiki-news-300d-1M.vec.zip"
    filename = "wiki-news-300d-1M.vec"
    dim = 300


@META_WORD_EMBEDDING.register()
class ViFastText(WordEmbedding):
    url = "https://dl.fbaipublicfiles.com/fasttext/vectors-crawl/cc.vi.300.vec.gz"
    filename = "cc.vi.300.vec.gz"
    dim = 300
