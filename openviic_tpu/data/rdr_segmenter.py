"""Python binding for the native Vietnamese word segmenter.

Replaces the reference's ``vncorenlp`` tokenizer option, which requires a
user-launched Java server on port 9000 (data_utils/utils.py:34-47).  The
native engine does lexicon longest-matching + RDR correction rules
(native/rdr_segmenter.cpp); ``pyvi`` is the pure-Python fallback when the
library or lexicon is unavailable.

Usage: tokenizer name ``"rdr"`` in ``DATASET.VOCAB.TOKENIZER`` (see
openviic_tpu/data/preprocess.py); lexicon/rules/model paths come from the
``OPENVIIC_RDR_LEXICON`` / ``OPENVIIC_RDR_RULES`` / ``OPENVIIC_RDR_MODEL``
environment variables or the constructor arguments.  ``OPENVIIC_RDR_MODEL``
accepts VnCoreNLP's original SCRDR tree serialization (the
``wordsegmenter.rdr`` format).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "librdr_segmenter.so")


class RDRSegmenter:
    _default: Optional["RDRSegmenter"] = None

    def __init__(
        self,
        lexicon_path: Optional[str] = None,
        rules_path: Optional[str] = None,
        model_path: Optional[str] = None,
    ):
        if not os.path.isfile(_LIB_PATH):
            import subprocess

            script = os.path.join(_REPO_ROOT, "native", "build.sh")
            if os.path.isfile(script):
                try:
                    subprocess.run(["sh", script], check=True, capture_output=True)
                except Exception:
                    pass
        if not os.path.isfile(_LIB_PATH):
            raise RuntimeError(
                f"native segmenter library missing at {_LIB_PATH}; "
                "run native/build.sh or use the 'pyvi' tokenizer"
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rdr_new.restype = ctypes.c_void_p
        lib.rdr_delete.argtypes = [ctypes.c_void_p]
        lib.rdr_load_lexicon.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rdr_load_rules.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rdr_add_word.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rdr_load_scrdr.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rdr_segment.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rdr_segment.restype = ctypes.c_void_p
        self._lib = lib
        self._handle = lib.rdr_new()

        lexicon_path = lexicon_path or os.environ.get("OPENVIIC_RDR_LEXICON")
        rules_path = rules_path or os.environ.get("OPENVIIC_RDR_RULES")
        model_path = model_path or os.environ.get("OPENVIIC_RDR_MODEL")
        if lexicon_path and os.path.isfile(lexicon_path):
            lib.rdr_load_lexicon(self._handle, lexicon_path.encode())
        if rules_path and os.path.isfile(rules_path):
            lib.rdr_load_rules(self._handle, rules_path.encode())
        if model_path and os.path.isfile(model_path):
            self.load_scrdr(model_path)

    def add_word(self, word: str) -> None:
        """Add a multi-syllable compound ('hoc sinh' style) to the lexicon."""
        self._lib.rdr_add_word(self._handle, word.encode())

    def load_scrdr(self, model_path: str) -> int:
        """Load a VnCoreNLP/RDRsegmenter SCRDR tree model (``.rdr`` file).

        The original serialization of the reference's stripped
        ``models/wordsegmenter/wordsegmenter.rdr`` blob (SURVEY.md §2.1):
        tab-indented ``condition : object.conclusion = "B|I"`` lines forming
        an except/else tree over syllable B/I tags.  Returns the number of
        nodes loaded."""
        n = self._lib.rdr_load_scrdr(self._handle, model_path.encode())
        if n < 0:
            raise ValueError(f"failed to parse SCRDR model at {model_path}")
        return n

    def tokenize(self, sentence: str) -> str:
        raw = self._lib.rdr_segment(self._handle, sentence.encode())
        try:
            return ctypes.cast(raw, ctypes.c_char_p).value.decode()
        finally:
            libc = ctypes.CDLL(None)
            libc.free(ctypes.c_void_p(raw))

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None and getattr(self, "_handle", None):
            lib.rdr_delete(self._handle)

    @classmethod
    def default(cls) -> "RDRSegmenter":
        if cls._default is None:
            try:
                cls._default = cls()
            except RuntimeError:
                # pure-Python fallback (the reference's pyvi option)
                from pyvi import ViTokenizer

                class _PyviWrapper:
                    def tokenize(self, s: str) -> str:
                        return ViTokenizer.tokenize(s)

                cls._default = _PyviWrapper()  # type: ignore[assignment]
        return cls._default
