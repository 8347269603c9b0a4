"""METEOR 1.5 golden tests (VERDICT r3 next #5).

The jar itself cannot run here (no JVM, zero egress), so the goldens are
HAND-DERIVED from the published METEOR 1.5 parameterisation (Denkowski &
Lavie 2014, "Meteor Universal"; English ranking task: alpha=0.85,
beta=0.2, gamma=0.6, delta=0.75; module weights exact=1.0, stem=0.6,
synonym=0.8, paraphrase=0.6):

    P   = sum_i w_i * wt(h_i) / wt(hyp)      (wt: delta per content word,
    R   = sum_i w_i * wt(r_i) / wt(ref)           1-delta per function word)
    Fmean = P*R / (alpha*P + (1-alpha)*R)
    Pen = gamma * (chunks / m_avg)^beta      (m_avg: matched words,
    score = Fmean * (1 - Pen)                     averaged over both sides)

Every constant below carries its full derivation, so a regression in the
parameter set, the weighting, the chunk counting, or the corpus
aggregation (summed stats, NOT averaged segment scores — the jar's
behaviour) fails against numbers traceable to the published formulas
rather than to this implementation's own output.  Data files (function
words / synonyms / paraphrases) are pinned per-test via the env
overrides, so the goldens do not depend on the bundled tables.

Mirrors reference usage: evaluation/meteor/meteor.py:26-65 (jar wrapper
with -l en -norm).
"""

import importlib

import numpy as np
import pytest

import openviic_tpu.evaluation.meteor15 as m15


@pytest.fixture()
def pinned_data(tmp_path, monkeypatch):
    """Pin function words + empty synonym/paraphrase tables, clear caches."""
    fw = tmp_path / "func.txt"
    fw.write_text("a\nthe\nis\nhe\non\n")
    syn = tmp_path / "syn.txt"
    syn.write_text("")  # empty -> synonym stage off
    monkeypatch.setenv("OPENVIIC_METEOR_FUNCTION_WORDS", str(fw))
    monkeypatch.setenv("OPENVIIC_METEOR_SYNONYMS", str(syn))
    monkeypatch.delenv("OPENVIIC_METEOR_PARAPHRASE", raising=False)
    _clear_caches()
    yield tmp_path
    _clear_caches()


def _clear_caches():
    m15._function_words.cache_clear()
    m15._synonym_lines.cache_clear()
    m15._synonym_sets.cache_clear()
    m15._paraphrase_lines.cache_clear()
    m15._paraphrase_table.cache_clear()


def _score_one(hyp: str, ref: str) -> float:
    corpus, seg = m15.Meteor15().compute_score({0: [ref]}, {0: [hyp]})
    assert seg.shape == (1,)
    return float(seg[0])


def test_identical_sentences_parameter_pin(pinned_data):
    # 6 identical words: P=R=1 regardless of word weights, Fmean=1,
    # one chunk, m_avg=6 -> score = 1 - 0.6*(1/6)^0.2 = 0.5807037287
    s = _score_one("a man is riding a bicycle", "a man is riding a bicycle")
    assert s == pytest.approx(0.5807037287370524, abs=1e-12)
    # 3 identical words: 1 - 0.6*(1/3)^0.2 = 0.5183550629
    s = _score_one("man rides bicycle", "man rides bicycle")
    assert s == pytest.approx(0.5183550629438616, abs=1e-12)


def test_no_match_scores_zero(pinned_data):
    assert _score_one("xyz abc", "def ghi") == 0.0


def test_exact_plus_stem_stage(pinned_data):
    # hyp "the dogs running" vs ref "the dog runs" ("the" is a pinned
    # function word):
    #   the<->the   exact (w=1.0), weight 0.25 each side
    #   dogs<->dog  stem  (w=0.6, porter: dogs->dog),   weight 0.75
    #   running<->runs stem (w=0.6, porter: run), weight 0.75
    # P = R = (1*0.25 + 0.6*0.75 + 0.6*0.75) / (0.25+0.75+0.75)
    #       = 1.15/1.75;  Fmean = P;  chunks=1 (monotone contiguous),
    # m_avg=3 -> score = (1.15/1.75)*(1 - 0.6*(1/3)^0.2) = 0.3406333271
    s = _score_one("the dogs running", "the dog runs")
    assert s == pytest.approx(0.3406333270773947, abs=1e-12)


def test_synonym_stage(pinned_data, monkeypatch):
    # synset {bicycle, bike} (stems differ: bicycl vs bike, so only the
    # synonym stage can match them):
    #   man, rides exact (w=1.0); bike<->bicycle synonym (w=0.8)
    # all content words:
    #   P = R = (1.0*0.75 + 1.0*0.75 + 0.8*0.75)/2.25 = 2.1/2.25
    # -> score = (2.1/2.25)*(1 - 0.6*(1/3)^0.2) = 0.4837980587
    syn = pinned_data / "syn2.txt"
    syn.write_text("bicycle bike\n")
    monkeypatch.setenv("OPENVIIC_METEOR_SYNONYMS", str(syn))
    _clear_caches()
    s = _score_one("man rides bike", "man rides bicycle")
    assert s == pytest.approx(0.4837980587476041, abs=1e-12)
    # sanity: without the synset the pair contributes nothing
    # (only 2/3 words match: P=R=1.5/2.25 -> 0.3455700449)
    monkeypatch.setenv(
        "OPENVIIC_METEOR_SYNONYMS", str(pinned_data / "syn.txt")
    )
    _clear_caches()
    assert _score_one("man rides bike", "man rides bicycle") < 0.36


def test_paraphrase_stage_four_stage_path(pinned_data, monkeypatch):
    # phrase table "hits the road ||| goes jogging" exercises the
    # multi-word span matcher (module 3, w=0.6):
    #   he<->he exact (function word, weight 0.25)
    #   hyp span "goes jogging" (2 content words, wt 1.5)
    #     <-> ref span "hits the road" (wt 0.75+0.25+0.75 = 1.75)
    # P = (0.25 + 0.6*1.5)/1.75  = 1.15/1.75
    # R = (0.25 + 0.6*1.75)/2.0  = 1.30/2.0
    # m_h=3, m_r=4 -> m_avg=3.5; spans contiguous with the exact match
    # on both sides -> chunks=1
    # Fmean = P*R/(0.85P+0.15R); Pen = 0.6*(1/3.5)^0.2
    # -> score = 0.3470012517
    par = pinned_data / "par.txt"
    par.write_text("hits the road ||| goes jogging\n")
    monkeypatch.setenv("OPENVIIC_METEOR_PARAPHRASE", str(par))
    _clear_caches()
    s = _score_one("he goes jogging", "he hits the road")
    assert s == pytest.approx(0.3470012517054327, abs=1e-12)
    # without the table only "he" matches
    monkeypatch.delenv("OPENVIIC_METEOR_PARAPHRASE")
    _clear_caches()
    assert _score_one("he goes jogging", "he hits the road") < 0.347


def test_corpus_aggregation_is_summed_stats(pinned_data):
    # two identical-pair segments (6 and 3 words): the corpus score must
    # come from SUMMED stats (P=R=1, chunks=1+1=2, m_avg=6+3=9):
    #   1 - 0.6*(2/9)^0.2 = 0.5558713930
    # the mean of the segment scores would be
    #   (0.5807037 + 0.5183551)/2 = 0.5495294 — a different number, so
    # this golden catches a mean-of-segments regression
    gts = {
        0: ["a man is riding a bicycle"],
        1: ["man rides bicycle"],
    }
    res = {
        0: ["a man is riding a bicycle"],
        1: ["man rides bicycle"],
    }
    corpus, seg = m15.Meteor15().compute_score(gts, res)
    assert corpus == pytest.approx(0.555871393015416, abs=1e-12)
    assert corpus != pytest.approx(float(np.mean(seg)), abs=1e-3)


def test_best_reference_selection(pinned_data):
    # multiple references: the jar scores against the best reference
    gts = {0: ["def ghi", "man rides bicycle"]}
    res = {0: ["man rides bicycle"]}
    corpus, seg = m15.Meteor15().compute_score(gts, res)
    assert seg[0] == pytest.approx(0.5183550629438616, abs=1e-12)


def test_native_scorer_matches_goldens(pinned_data, monkeypatch):
    """The C++ scorer (round 4: all four stages) must reproduce the
    hand-derived goldens bit-for-bit with the same pinned data files."""
    from openviic_tpu import native

    if not native.available():
        import pytest as _pytest

        _pytest.skip("native library not built")

    scorer = native.NativeMeteor15()

    def native_one(hyp, ref):
        corpus, seg = scorer.compute_score({0: [ref]}, {0: [hyp]})
        return float(seg[0])

    # identical + exact/stem goldens (empty synonym/paraphrase tables)
    assert native_one(
        "a man is riding a bicycle", "a man is riding a bicycle"
    ) == pytest.approx(0.5807037287370524, abs=1e-12)
    assert native_one(
        "the dogs running", "the dog runs"
    ) == pytest.approx(0.3406333270773947, abs=1e-12)

    # synonym stage
    syn = pinned_data / "syn_native.txt"
    syn.write_text("bicycle bike\n")
    monkeypatch.setenv("OPENVIIC_METEOR_SYNONYMS", str(syn))
    _clear_caches()
    assert native_one(
        "man rides bike", "man rides bicycle"
    ) == pytest.approx(0.4837980587476041, abs=1e-12)

    # paraphrase stage (4-stage path)
    par = pinned_data / "par_native.txt"
    par.write_text("hits the road ||| goes jogging\n")
    monkeypatch.setenv("OPENVIIC_METEOR_PARAPHRASE", str(par))
    _clear_caches()
    assert native_one(
        "he goes jogging", "he hits the road"
    ) == pytest.approx(0.3470012517054327, abs=1e-12)

    # corpus aggregation through the native path
    gts = {0: ["a man is riding a bicycle"], 1: ["man rides bicycle"]}
    res = {0: ["a man is riding a bicycle"], 1: ["man rides bicycle"]}
    monkeypatch.delenv("OPENVIIC_METEOR_PARAPHRASE")
    monkeypatch.setenv(
        "OPENVIIC_METEOR_SYNONYMS", str(pinned_data / "syn.txt")
    )
    _clear_caches()
    corpus, _ = scorer.compute_score(gts, res)
    assert corpus == pytest.approx(0.555871393015416, abs=1e-12)
    _clear_caches()


def test_paraphrase_converter_roundtrip(pinned_data, tmp_path, monkeypatch):
    """scripts/convert_meteor_paraphrase.py: the official paraphrase-en.gz
    format (2- or 3-field ||| lines) converts to the loader's table and
    drives the 4-stage path end to end."""
    import gzip
    import os
    import subprocess
    import sys

    raw = tmp_path / "paraphrase-en.gz"
    with gzip.open(raw, "wt", encoding="utf-8") as f:
        # official-style lines: phrase ||| paraphrase ||| weight
        f.write("hits the road ||| goes jogging ||| 0.82\n")
        f.write("low weight ||| dropped pair ||| 0.01\n")
        f.write("same ||| same ||| 0.9\n")  # identity -> dropped
        f.write("a span that is far too long to keep ||| x ||| 0.9\n")
        f.write("malformed line without separator\n")
    out = tmp_path / "converted.gz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "convert_meteor_paraphrase.py"),
         str(raw), str(out), "--min-weight", "0.1"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("OPENVIIC_METEOR_PARAPHRASE", str(out))
    _clear_caches()
    table = m15._paraphrase_table()
    assert table is not None
    assert "goes jogging" in table["hits the road"]
    assert "dropped pair" not in table.get("low weight", set())
    assert "same" not in table
    # and the converted table scores exactly the hand-derived golden
    s = _score_one("he goes jogging", "he hits the road")
    assert s == pytest.approx(0.3470012517054327, abs=1e-12)
    _clear_caches()


def test_native_paraphrase_crlf_and_duplicate_lines(pinned_data, monkeypatch):
    """CRLF paraphrase files and duplicate lines must score identically
    in the native C++ and Python scorers (round-4 advisor findings: the
    C++ trim previously kept a trailing '\\r' so CRLF phrases never
    matched, and duplicate lines were kept while Python dedupes via
    sets, shifting alignment tie-breaks)."""
    from openviic_tpu import native

    if not native.available():
        pytest.skip("native extension not built")
    par = pinned_data / "par_crlf.txt"
    # CRLF endings + the same pair repeated three times
    par.write_bytes(
        b"hits the road ||| goes jogging\r\n"
        b"hits the road ||| goes jogging\r\n"
        b"hits the road ||| goes jogging\r\n"
        b"big dog ||| large hound\r\n"
    )
    monkeypatch.setenv("OPENVIIC_METEOR_PARAPHRASE", str(par))
    _clear_caches()
    gts = {
        "0": ["he hits the road", "a big dog runs"],
        "1": ["the big dog barks"],
    }
    res = {"0": ["he goes jogging"], "1": ["the large hound barks"]}
    py_corpus, py_seg = m15.Meteor15().compute_score(gts, res)
    nat_corpus, nat_seg = native.NativeMeteor15().compute_score(gts, res)
    assert nat_corpus == pytest.approx(py_corpus, abs=1e-12)
    assert nat_seg == pytest.approx(py_seg, abs=1e-12)
    # the CRLF phrases actually matched (score reflects the paraphrase)
    assert py_seg[0] == pytest.approx(0.3470012517054327, abs=1e-12)
    _clear_caches()


def test_native_long_segment_falls_back_to_python(pinned_data):
    """Segments over 128 tokens exceed the native aligner's two 64-bit
    span masks; NativeMeteor15 must route such batches to the Python
    scorer so results never silently diverge (round-4 advisor)."""
    from openviic_tpu import native

    if not native.available():
        pytest.skip("native extension not built")
    long_ref = " ".join(f"w{i % 7}" for i in range(200))
    long_hyp = " ".join(f"w{i % 5}" for i in range(150))
    gts = {"0": [long_ref], "1": ["a man walks"]}
    res = {"0": [long_hyp], "1": ["a man walks"]}
    py_corpus, py_seg = m15.Meteor15().compute_score(gts, res)
    nat_corpus, nat_seg = native.NativeMeteor15().compute_score(gts, res)
    assert nat_corpus == pytest.approx(py_corpus, abs=1e-12)
    assert nat_seg == pytest.approx(py_seg, abs=1e-12)


def test_jar_fixture_if_present():
    """Ground-truth seam (VERDICT r4 missing #3): if a machine with a JVM
    has produced ``tests/fixtures/meteor_jar_vectors.json`` via
    scripts/verify_meteor_jar.py, every segment score and the corpus
    score must be reproduced by this repo's scorer.  Without the fixture
    (this offline environment) the formula-derived goldens above remain
    the fallback and this test skips.

    Note: reproducing the jar bit-for-bit also requires pointing the
    OPENVIIC_METEOR_* env vars at the jar's own data files (function
    words, WordNet synonyms via convert, paraphrase-en.gz via
    scripts/convert_meteor_paraphrase.py) — the bundled tables are
    subsets.  verify_meteor_jar.py --check reports deltas on the
    generating machine."""
    import json
    import os

    fixture_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures",
        "meteor_jar_vectors.json",
    )
    if not os.path.exists(fixture_path):
        pytest.skip("no jar fixture (scripts/verify_meteor_jar.py "
                    "needs a JVM + meteor-1.5.jar)")
    with open(fixture_path) as f:
        fixture = json.load(f)
    gts = {str(i): seg["refs"] for i, seg in enumerate(fixture["segments"])}
    res = {str(i): [seg["hyp"]] for i, seg in enumerate(fixture["segments"])}
    corpus, seg_scores = m15.Meteor15().compute_score(gts, res)
    for i, seg in enumerate(fixture["segments"]):
        assert seg_scores[i] == pytest.approx(
            seg["segment_score"], abs=1e-5
        ), f"segment {i} diverges from the jar: {seg['hyp']!r}"
    assert corpus == pytest.approx(fixture["corpus_score"], abs=1e-5)
