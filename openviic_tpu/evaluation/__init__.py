"""Caption evaluation suite.

Equivalent of the reference ``evaluation/`` package (SURVEY.md #27):
BLEU-1..4, METEOR, ROUGE-L and CIDEr over ``{image_id: [captions]}``
dicts, plus a PTB tokenizer.  All scorers are native (no JVM subprocesses —
the reference shells out to three Java jars, SURVEY.md §2.1).

``compute_scores`` mirrors evaluation/__init__.py:7-16: returns
``({metric: score}, {metric: per_image_scores})``.
"""

from openviic_tpu.evaluation.bleu import Bleu
from openviic_tpu.evaluation.meteor import Meteor
from openviic_tpu.evaluation.rouge import Rouge
from openviic_tpu.evaluation.cider import Cider
from openviic_tpu.evaluation.ptb_tokenizer import PTBTokenizer


def compute_scores(gts, gen):
    metrics = (Bleu(), Meteor(), Rouge(), Cider())
    all_score = {}
    all_scores = {}
    for metric in metrics:
        score, scores = metric.compute_score(gts, gen)
        all_score[str(metric)] = score
        all_scores[str(metric)] = scores
    return all_score, all_scores


__all__ = ["Bleu", "Meteor", "Rouge", "Cider", "PTBTokenizer", "compute_scores"]
