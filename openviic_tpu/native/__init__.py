"""ctypes binding for the native (C++) scorers/tokenizer.

The shared library (native/libopenviic_native.so) replaces the reference's
Java subprocesses (SURVEY.md §2.1) and accelerates the SCST CIDEr reward.
If the library is missing, ``available()`` is False and callers fall back
to the pure-Python implementations — the framework stays fully functional
without a compiler.

Build: ``native/build.sh``; this module also attempts a one-shot build on
first import when g++ is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libopenviic_native.so")

_RS = "\x1e"  # record separator
_FS = "\x1f"  # field separator (refs within a record)

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> None:
    script = os.path.join(_REPO_ROOT, "native", "build.sh")
    if os.path.isfile(script):
        try:
            subprocess.run(
                ["sh", script], check=True, capture_output=True, timeout=120
            )
        except Exception:
            pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        _try_build()
    if not os.path.isfile(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ov_free.argtypes = [ctypes.c_void_p]
    lib.ov_cider_new.argtypes = [ctypes.c_char_p]
    lib.ov_cider_new.restype = ctypes.c_void_p
    lib.ov_cider_delete.argtypes = [ctypes.c_void_p]
    lib.ov_cider_score.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.ov_cider_score.restype = ctypes.POINTER(ctypes.c_double)
    lib.ov_meteor_score.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ov_meteor_score.restype = ctypes.POINTER(ctypes.c_double)
    try:
        lib.ov_meteor15_score.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.ov_meteor15_score.restype = ctypes.POINTER(ctypes.c_double)
    except AttributeError:  # stale pre-round-2 library
        pass
    try:
        lib.ov_meteor15_score_syn.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        lib.ov_meteor15_score_syn.restype = ctypes.POINTER(ctypes.c_double)
    except AttributeError:  # stale pre-round-3 library
        pass
    try:
        lib.ov_meteor15_score_par.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.ov_meteor15_score_par.restype = ctypes.POINTER(ctypes.c_double)
    except AttributeError:  # stale pre-round-4 library
        pass
    lib.ov_ptb_tokenize.argtypes = [ctypes.c_char_p]
    lib.ov_ptb_tokenize.restype = ctypes.c_void_p  # manual free
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_text(x) -> str:
    if isinstance(x, (list, tuple)):
        return " ".join(x)
    return x


def _encode_pairs(gts: Dict, res: Dict) -> Tuple[bytes, bytes, List]:
    keys = list(gts.keys())
    gens = _RS.join(_as_text(res[k][0]) for k in keys)
    refs = _RS.join(_FS.join(_as_text(r) for r in gts[k]) for k in keys)
    return gens.encode(), refs.encode(), keys


def _read_scores(ptr, n: int) -> Tuple[float, np.ndarray]:
    lib = _load()
    values = np.ctypeslib.as_array(ptr, shape=(n + 1,)).copy()
    lib.ov_free(ctypes.cast(ptr, ctypes.c_void_p))
    return float(values[0]), values[1:]


class NativeCider:
    """CIDEr with optional precomputed doc-frequency (SCST reuse)."""

    def __init__(self, gts: Optional[Dict] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._handle = None
        if gts is not None:
            refs = _RS.join(
                _FS.join(_as_text(r) for r in refs_i) for refs_i in gts.values()
            )
            self._handle = lib.ov_cider_new(refs.encode())

    def compute_score(self, gts: Dict, res: Dict):
        lib = _load()
        gens_b, refs_b, keys = _encode_pairs(gts, res)
        ptr = lib.ov_cider_score(self._handle, gens_b, refs_b)
        if not ptr:
            raise RuntimeError("native cider failed")
        return _read_scores(ptr, len(keys))

    def __del__(self):
        lib = _load()
        if lib is not None and getattr(self, "_handle", None):
            lib.ov_cider_delete(self._handle)

    def __str__(self) -> str:
        return "CIDEr"


class NativeMeteor:
    """Classic (2007-parameter) scorer — mirrors evaluation.MeteorClassic."""

    def compute_score(self, gts: Dict, res: Dict):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        gens_b, refs_b, keys = _encode_pairs(gts, res)
        ptr = lib.ov_meteor_score(gens_b, refs_b)
        if not ptr:
            raise RuntimeError("native meteor failed")
        return _read_scores(ptr, len(keys))

    def __str__(self) -> str:
        return "METEOR"


class NativeMeteor15:
    """METEOR 1.5 en-norm parameterisation — mirrors evaluation.Meteor
    (meteor15.py) for all four stages (exact/stem/synonym/paraphrase,
    round 4), reading the same function-word, synonym, and paraphrase
    data the Python scorer resolves (bundled evaluation/data/ files or
    the OPENVIIC_METEOR_* overrides)."""

    def compute_score(self, gts: Dict, res: Dict):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        from openviic_tpu.evaluation.meteor15 import (
            _function_words,
            _paraphrase_lines,
            _synonym_lines,
        )

        # the native aligner tracks spans in two 64-bit masks, capping
        # segments at 128 tokens; the Python scorer's int masks are
        # unbounded.  Captions are tens of tokens so this never fires in
        # the hot path, but for exactness fall back to the Python scorer
        # when any segment would be truncated.
        def _too_long(text) -> bool:
            return len(str(text).split()) > 128

        if any(
            _too_long(res[k][0]) or any(_too_long(r) for r in gts[k])
            for k in gts
        ):
            from openviic_tpu.evaluation.meteor15 import Meteor15

            return Meteor15().compute_score(gts, res)

        gens_b, refs_b, keys = _encode_pairs(gts, res)
        fwords = " ".join(sorted(_function_words())).encode()
        syn_lines = _synonym_lines()
        par_lines = _paraphrase_lines()
        if par_lines:
            if not hasattr(lib, "ov_meteor15_score_par"):
                raise RuntimeError(
                    "stale native library lacks the paraphrase stage"
                )
            ptr = lib.ov_meteor15_score_par(
                gens_b, refs_b, fwords,
                "\n".join(syn_lines or ()).encode(),
                "\n".join(par_lines).encode(),
            )
        elif syn_lines:
            if not hasattr(lib, "ov_meteor15_score_syn"):
                raise RuntimeError(
                    "stale native library lacks the synonym stage"
                )
            ptr = lib.ov_meteor15_score_syn(
                gens_b, refs_b, fwords, "\n".join(syn_lines).encode()
            )
        elif hasattr(lib, "ov_meteor15_score"):
            ptr = lib.ov_meteor15_score(gens_b, refs_b, fwords)
        else:
            raise RuntimeError("native library unavailable")
        if not ptr:
            raise RuntimeError("native meteor15 failed")
        return _read_scores(ptr, len(keys))

    def __str__(self) -> str:
        return "METEOR"


def ptb_tokenize_batch(lines: Sequence[str]) -> List[str]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    raw = lib.ov_ptb_tokenize(_RS.join(lines).encode())
    try:
        text = ctypes.cast(raw, ctypes.c_char_p).value.decode()
    finally:
        lib.ov_free(raw)
    return text.split(_RS)
