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


SCRDR_MODEL = (
    # root default: keep the initial tag
    'True : object.conclusion = "NN"\n'
    # B-tagged syllables stay B unless an exception below fires
    '\tobject.tag == "B" : object.conclusion = "B"\n'
    # ... "mèo" after "con" starts inside the word con_mèo
    '\t\tobject.word == "mèo" and object.prevWord1 == "con" : '
    'object.conclusion = "I"\n'
    # ...... unless followed by "hoang" (deeper exception wins)
    '\t\t\tobject.nextWord1 == "hoang" : object.conclusion = "B"\n'
    # else-sibling chain at depth 2: "bộ" joins a preceding "đi"
    '\t\tobject.word == "bộ" and object.prevTag1 == "B" and '
    'object.prevWord1 == "đi" : object.conclusion = "I"\n'
    # else-branch of the depth-1 node: I-tagged syllables stay I
    '\tobject.tag == "I" : object.conclusion = "I"\n'
    # ... except "học" after "những sinh" is split off
    '\t\tobject.word == "học" and object.prevWord2 == "những" : '
    'object.conclusion = "B"\n'
)


@pytest.fixture()
def scrdr_segmenter(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text("sinh học\n")
    model = tmp_path / "model.rdr"
    model.write_text(SCRDR_MODEL)
    try:
        return RDRSegmenter(str(lex), model_path=str(model))
    except RuntimeError:
        pytest.skip("native segmenter not built")


def test_scrdr_node_count(tmp_path):
    model = tmp_path / "model.rdr"
    model.write_text(SCRDR_MODEL)
    try:
        seg = RDRSegmenter(model_path=str(model))
    except RuntimeError:
        pytest.skip("native segmenter not built")
    assert seg.load_scrdr(str(model)) == 7


def test_scrdr_join_correction(scrdr_segmenter):
    # lexicon alone leaves "con mèo" split; the tree's B->I exception joins
    assert scrdr_segmenter.tokenize("một con mèo") == "một con_mèo"
    # deeper exception ripples back to B before "hoang"
    assert (
        scrdr_segmenter.tokenize("một con mèo hoang") == "một con mèo hoang"
    )


def test_scrdr_else_sibling(scrdr_segmenter):
    # the depth-2 else-sibling rule joins "đi bộ" (not in the lexicon)
    assert scrdr_segmenter.tokenize("đang đi bộ") == "đang đi_bộ"


def test_scrdr_split_correction(scrdr_segmenter):
    # lexicon tags "sinh học" as one word; the I->B exception splits it
    # when two positions back is "những"
    assert scrdr_segmenter.tokenize("ngành sinh học") == "ngành sinh_học"
    assert scrdr_segmenter.tokenize("những sinh học") == "những sinh học"


def test_scrdr_malformed_model(tmp_path):
    model = tmp_path / "bad.rdr"
    model.write_text('\tobject.tag == "B" : object.conclusion = "B"\n')
    try:
        seg = RDRSegmenter()
    except RuntimeError:
        pytest.skip("native segmenter not built")
    with pytest.raises(ValueError):
        seg.load_scrdr(str(model))

    # an unparseable condition must fail the load, not become an
    # always-firing empty condition
    bad_cond = tmp_path / "bad_cond.rdr"
    bad_cond.write_text(
        'True : object.conclusion = "NN"\n'
        '\tobject.tag != "B" : object.conclusion = "I"\n'
    )
    with pytest.raises(ValueError):
        seg.load_scrdr(str(bad_cond))


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
