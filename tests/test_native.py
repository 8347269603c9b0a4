"""Native C++ scorers must agree with the pure-Python implementations."""

import numpy as np
import pytest

from openviic_tpu import native
from openviic_tpu.evaluation import Cider
from openviic_tpu.evaluation.meteor import MeteorClassic
from openviic_tpu.evaluation.ptb_tokenizer import PTBTokenizer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

GTS = {
    "0": ["một người đàn ông đi bộ trên đường", "người đàn ông trên phố"],
    "1": ["hai đứa trẻ chơi bóng", "trẻ em đá bóng trên sân"],
    "2": ["con mèo nằm trên ghế"],
}
RES = {
    "0": ["một người đàn ông đi trên đường"],
    "1": ["hai đứa trẻ đá bóng"],
    "2": ["con chó nằm trên ghế"],
}


def test_native_cider_matches_python():
    py_score, py_scores = Cider().compute_score(GTS, RES)
    nat_score, nat_scores = native.NativeCider().compute_score(GTS, RES)
    assert nat_score == pytest.approx(py_score, abs=1e-9)
    np.testing.assert_allclose(nat_scores, py_scores, atol=1e-9)


def test_native_cider_with_precomputed_df():
    train = {"a": ["một con mèo trên ghế"], "b": ["hai đứa trẻ chơi bóng"]}
    py = Cider(gts=train)
    nat = native.NativeCider(gts=train)
    py_score, py_scores = py.compute_score(GTS, RES)
    nat_score, nat_scores = nat.compute_score(GTS, RES)
    assert nat_score == pytest.approx(py_score, abs=1e-9)
    np.testing.assert_allclose(nat_scores, py_scores, atol=1e-9)


def test_native_meteor_matches_python():
    gts = {
        "0": ["the cat sat on the mat"],
        "1": ["the cats are running fast", "cats run quickly"],
        "2": ["x y z"],
    }
    res = {"0": ["the cat sat on the mat"], "1": ["the cat is run"], "2": ["a b c"]}
    py_score, py_scores = MeteorClassic().compute_score(gts, res)
    nat_score, nat_scores = native.NativeMeteor().compute_score(gts, res)
    assert nat_score == pytest.approx(py_score, abs=1e-9)
    np.testing.assert_allclose(nat_scores, py_scores, atol=1e-9)


def test_native_ptb_matches_python():
    lines = [
        "A man, with a dog (brown), walks.",
        "He isn't here; she's gone...",
        "Numbers: 1,000 and $5 & 50%!",
    ]
    py = PTBTokenizer().tokenize({i: [l] for i, l in enumerate(lines)})
    nat = native.ptb_tokenize_batch(lines)
    for i, line in enumerate(lines):
        assert nat[i] == py[i][0], f"mismatch on {line!r}"


def test_native_cider_speed():
    """Native CIDEr should beat Python comfortably on a larger batch."""
    import time

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    gts = {}
    res = {}
    for i in range(300):
        gts[str(i)] = [
            " ".join(rng.choice(vocab, size=12)) for _ in range(3)
        ]
        res[str(i)] = [" ".join(rng.choice(vocab, size=12))]

    t0 = time.perf_counter()
    py_score, _ = Cider().compute_score(gts, res)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nat_score, _ = native.NativeCider().compute_score(gts, res)
    t_nat = time.perf_counter() - t0
    assert nat_score == pytest.approx(py_score, abs=1e-9)
    assert t_nat < t_py, f"native {t_nat:.4f}s not faster than python {t_py:.4f}s"


def test_native_meteor15_matches_python():
    """C++ METEOR 1.5 must equal the Python meteor15 scorer exactly —
    both resolve the same bundled function-word + synonym data
    (evaluation/data/), so exact, stem, AND synonym stages are compared
    ('big'/'large' in the vocab share a bundled synset)."""
    from openviic_tpu import native
    from openviic_tpu.evaluation.meteor15 import Meteor15

    if not native.available():
        pytest.skip("native extension not built")
    rng = np.random.default_rng(5)
    words = ["the", "cats", "are", "running", "dog", "walks", "a", "on",
             "mat", "red", "big", "large", "street", "road"]
    gts, res = {}, {}
    for i in range(30):
        def sent():
            n = int(rng.integers(3, 10))
            return " ".join(rng.choice(words, size=n))
        gts[str(i)] = [sent() for _ in range(int(rng.integers(1, 4)))]
        res[str(i)] = [sent()]
    py_score, py_scores = Meteor15().compute_score(gts, res)
    nat_score, nat_scores = native.NativeMeteor15().compute_score(gts, res)
    np.testing.assert_almost_equal(nat_score, py_score, decimal=10)
    np.testing.assert_almost_equal(nat_scores, py_scores, decimal=10)
