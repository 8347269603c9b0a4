"""Host-side caption preprocessing and pluggable tokenizers.

Token-for-token parity with the reference preprocessing (reference:
data_utils/utils.py:6-80): the same punctuation-splitting regex rules in the
same order, lowercasing, whitespace normalisation, and the same four
tokenizer options (``null`` identity, ``pyvi``, ``spacy`` Vietnamese,
``vncorenlp``).  Tokenization runs once at dataset-build time on the host
CPU; the TPU input pipeline only ever sees fixed-shape integer arrays.

The ``vncorenlp`` option talks to a user-launched VnCoreNLP server exactly
like the reference (data_utils/utils.py:34-47); the native C++ RDR segmenter
(see native/) is exposed as tokenizer name ``rdr`` when built.
"""

from __future__ import annotations

import re
from typing import Callable, List, Union

# (pattern, replacement) pairs applied in order — same rules and order as the
# reference so vocabularies sort identically.
_PUNCT_RULES = [
    (re.compile(r"[“”]"), '"'),
    (re.compile(r"!"), " ! "),
    (re.compile(r"\?"), " ? "),
    (re.compile(r":"), " : "),
    (re.compile(r";"), " ; "),
    (re.compile(r","), " , "),
    (re.compile(r"\""), ' " '),
    (re.compile(r"'"), " ' "),
    (re.compile(r"\("), " ( "),
    (re.compile(r"\["), " [ "),
    (re.compile(r"\)"), " ) "),
    (re.compile(r"\]"), " ] "),
    (re.compile(r"/"), " / "),
    (re.compile(r"\."), " . "),
    (re.compile(r"\$"), " $ "),
    (re.compile(r"\&"), " & "),
    (re.compile(r"\*"), " * "),
]


def get_tokenizer(tokenizer: Union[None, str, Callable]) -> Callable[[str], str]:
    """Resolve a tokenizer spec to a callable str -> str."""
    if tokenizer is None:
        return lambda s: s
    if callable(tokenizer):
        return tokenizer

    if tokenizer == "pyvi":
        from pyvi import ViTokenizer

        return ViTokenizer.tokenize

    if tokenizer == "spacy":
        from spacy.lang.vi import Vietnamese

        nlp = Vietnamese()

        def spacy_tokenize(s: str) -> str:
            return " ".join(tok.text for tok in nlp(s))

        return spacy_tokenize

    if tokenizer == "vncorenlp":
        from vncorenlp import VnCoreNLP

        annotator = VnCoreNLP(address="http://127.0.0.1", port=9000)

        def vncorenlp_tokenize(s: str) -> str:
            words = annotator.tokenize(s)[0]
            return " ".join(words)

        return vncorenlp_tokenize

    if tokenizer == "rdr":
        from openviic_tpu.data.rdr_segmenter import RDRSegmenter

        return RDRSegmenter.default().tokenize

    raise ValueError(f"Unknown tokenizer {tokenizer!r}")


def preprocess_caption(caption: str, tokenizer: Union[None, str, Callable]) -> List[str]:
    """Split punctuation, lowercase, tokenize, and return a token list."""
    for pattern, repl in _PUNCT_RULES:
        caption = pattern.sub(repl, caption)
    caption = get_tokenizer(tokenizer)(caption.lower())
    caption = " ".join(caption.strip().split())
    return caption.strip().split()
