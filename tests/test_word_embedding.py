"""Word-embedding loader tests (GloVe parsing, cache, unk init, vocab wiring)."""

import numpy as np
import pytest

from openviic_tpu.builders import META_WORD_EMBEDDING
from openviic_tpu.data.word_embedding import WordEmbedding, unk_init


@pytest.fixture()
def glove_cache(tmp_path):
    (tmp_path / "test_vectors.txt").write_text(
        "người 0.1 0.2 0.3\n"
        "mèo 0.4 0.5 0.6\n"
        "chó -0.1 -0.2 -0.3\n"
    )
    return tmp_path


class _TestVectors(WordEmbedding):
    url = None
    filename = "test_vectors.txt"
    dim = 3


def test_parse_and_lookup(glove_cache):
    we = _TestVectors(cache=str(glove_cache))
    assert len(we) == 3
    np.testing.assert_allclose(we["mèo"], [0.4, 0.5, 0.6], atol=1e-6)
    # unknown tokens use deterministic unk init (data_utils/utils.py:103-119)
    np.testing.assert_allclose(we["xyz"], [3.0, 3.0, 3.0])
    np.testing.assert_allclose(we["<pad>"], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(we["<bos>"], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(we["<eos>"], [2.0, 2.0, 2.0])


def test_binary_cache_roundtrip(glove_cache):
    we1 = _TestVectors(cache=str(glove_cache))
    assert (glove_cache / "test_vectors.txt.npz").is_file()
    # delete the source; cache alone must suffice
    (glove_cache / "test_vectors.txt").unlink()
    we2 = _TestVectors(cache=str(glove_cache))
    np.testing.assert_allclose(we2["người"], we1["người"])


def test_fasttext_header_line(tmp_path):
    (tmp_path / "ft.vec").write_text("2 4\na 1 2 3 4\nb 5 6 7 8\n")

    class _FT(WordEmbedding):
        url = None
        filename = "ft.vec"
        dim = 4

    we = _FT(cache=str(tmp_path))
    assert len(we) == 2 and we.dim == 4
    np.testing.assert_allclose(we["b"], [5, 6, 7, 8])


def test_registered_names():
    for name in [
        "PhoW2VSyllable100", "PhoW2VSyllable300", "PhoW2VWord100",
        "PhoW2VWord300", "EnFastText", "ViFastText",
    ]:
        assert name in META_WORD_EMBEDDING


def test_vocab_load_word_embeddings(glove_cache, tiny_vocab):
    import copy

    vocab = copy.copy(tiny_vocab)
    we = _TestVectors(cache=str(glove_cache))
    vocab.load_word_embeddings(we)
    assert vocab.word_embeddings.shape == (len(vocab), 3)
    idx = vocab.stoi.get("mèo")
    if idx is not None:
        np.testing.assert_allclose(vocab.word_embeddings[idx], [0.4, 0.5, 0.6])
    np.testing.assert_allclose(vocab.word_embeddings[vocab.padding_idx], 0.0)
