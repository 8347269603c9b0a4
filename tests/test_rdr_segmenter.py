"""Native RDR segmenter tests."""

import os

import pytest

from openviic_tpu.data.rdr_segmenter import RDRSegmenter


@pytest.fixture()
def segmenter(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text(
        "học sinh\n"
        "sinh học\n"
        "đàn ông\n"
        "đi bộ\n"
        "bóng đá\n"
        "khoa học máy tính\n"
    )
    rules = tmp_path / "rules.txt"
    rules.write_text(
        "# exceptions over the base segmentation\n"
        "JOIN * con mèo\n"
        "SPLIT những sinh_học\n"
    )
    try:
        return RDRSegmenter(str(lex), str(rules))
    except RuntimeError:
        pytest.skip("native segmenter not built")


def test_longest_matching(segmenter):
    assert segmenter.tokenize("học sinh đi bộ") == "học_sinh đi_bộ"
    assert (
        segmenter.tokenize("khoa học máy tính và bóng đá")
        == "khoa_học_máy_tính và bóng_đá"
    )


def test_unknown_words_pass_through(segmenter):
    assert segmenter.tokenize("xin chào thế giới") == "xin chào thế giới"


def test_join_rule(segmenter):
    # base segmentation leaves "con mèo" split; the JOIN rule merges it
    assert segmenter.tokenize("một con mèo") == "một con_mèo"


def test_split_rule(segmenter):
    # "sinh học" is in the lexicon but the SPLIT rule fires after "những"
    assert segmenter.tokenize("những sinh học") == "những sinh học"
    assert segmenter.tokenize("ngành sinh học") == "ngành sinh_học"


def test_add_word(segmenter):
    assert "xe máy" not in ("",)  # placeholder clarity
    assert segmenter.tokenize("chiếc xe máy") == "chiếc xe máy"
    segmenter.add_word("xe máy")
    assert segmenter.tokenize("chiếc xe máy") == "chiếc xe_máy"


def test_preprocess_caption_with_rdr(tmp_path, monkeypatch):
    lex = tmp_path / "lex.txt"
    lex.write_text("đàn ông\n")
    monkeypatch.setenv("OPENVIIC_RDR_LEXICON", str(lex))
    # reset the cached default so the env var takes effect
    RDRSegmenter._default = None
    from openviic_tpu.data.preprocess import preprocess_caption

    tokens = preprocess_caption("Một người đàn ông!", "rdr")
    assert tokens == ["một", "người", "đàn_ông", "!"]
    RDRSegmenter._default = None
