"""Caption evaluation suite.

Equivalent of the reference ``evaluation/`` package (SURVEY.md #27):
BLEU-1..4, METEOR, ROUGE-L and CIDEr over ``{image_id: [captions]}``
dicts, plus a PTB tokenizer.  All scorers are native (no JVM subprocesses —
the reference shells out to three Java jars, SURVEY.md §2.1).

``compute_scores`` mirrors evaluation/__init__.py:7-16: returns
``({metric: score}, {metric: per_image_scores})``.
"""

import os

from openviic_tpu.evaluation.bleu import Bleu
from openviic_tpu.evaluation.meteor import MeteorClassic
from openviic_tpu.evaluation.meteor15 import Meteor15 as Meteor
from openviic_tpu.evaluation.rouge import Rouge
from openviic_tpu.evaluation.cider import Cider
from openviic_tpu.evaluation.ptb_tokenizer import PTBTokenizer


def _metrics():
    """Prefer the native C++ METEOR/CIDEr when built (bit-identical to the
    Python implementations — tests/test_native.py); OPENVIIC_NATIVE=0
    disables."""
    # METEOR: the 1.5 en-norm parameterisation (meteor15.py) — matches the
    # reference's jar invocation.  The native C++ 1.5 scorer substitutes
    # when built; it reads the same bundled/override function-word,
    # synonym, and (round 4) paraphrase data as the Python scorer.
    meteor, cider = Meteor(), Cider()
    if os.environ.get("OPENVIIC_NATIVE", "1") != "0":
        try:
            from openviic_tpu import native
            from openviic_tpu.evaluation.meteor15 import (
                _paraphrase_table,
                _synonym_lines,
            )

            if native.available():
                cider = native.NativeCider()
                # the native scorer must support every stage the
                # configured data activates — a stale library missing the
                # paraphrase (pre-round-4) or synonym (pre-round-3) entry
                # point stays on the Python scorer instead of crashing at
                # score time
                lib = native._load()
                if _paraphrase_table() is not None:
                    needed = "ov_meteor15_score_par"
                elif _synonym_lines():
                    needed = "ov_meteor15_score_syn"
                else:
                    needed = "ov_meteor15_score"
                if lib is not None and hasattr(lib, needed):
                    meteor = native.NativeMeteor15()
        except Exception:
            pass
    return (Bleu(), meteor, Rouge(), cider)


def compute_scores(gts, gen):
    all_score = {}
    all_scores = {}
    for metric in _metrics():
        score, scores = metric.compute_score(gts, gen)
        all_score[str(metric)] = score
        all_scores[str(metric)] = scores
    return all_score, all_scores


__all__ = ["Bleu", "Meteor", "MeteorClassic", "Rouge", "Cider", "PTBTokenizer", "compute_scores"]
