"""Vocab behavior parity tests (reference data_utils/vocab.py semantics)."""

import numpy as np
import pytest

from openviic_tpu.config import ConfigNode
from openviic_tpu.data import Vocab
from openviic_tpu.data.preprocess import preprocess_caption
from tests.conftest import make_dataset_config


def test_specials_occupy_first_ids(tiny_vocab):
    assert tiny_vocab.itos[:4] == ["<pad>", "<bos>", "<eos>", "<unk>"]
    assert tiny_vocab.padding_idx == 0
    assert tiny_vocab.bos_idx == 1
    assert tiny_vocab.eos_idx == 2
    assert tiny_vocab.unk_idx == 3


def test_frequency_sort_alphabetical_tiebreak(tmp_path):
    """Words sort by frequency desc, then alphabetically (vocab.py:49-55)."""
    import json

    caps = ["b b a a c", "b a d", "b"]
    data = {
        "images": [{"id": 0, "file_name": "x.jpg"}],
        "annotations": [{"image_id": 0, "caption": c} for c in caps],
    }
    for split in ("train", "dev", "test"):
        with open(tmp_path / f"{split}.json", "w") as f:
            json.dump(data, f)
    cfg = make_dataset_config(tmp_path)
    vocab = Vocab(cfg)
    # freq: b=4, a=3, c=1, d=1 -> b a, then c d alphabetically
    assert vocab.itos[4:] == ["b", "a", "c", "d"]


def test_encode_caption_structure(tiny_vocab):
    caption = ["một", "con", "mèo"]
    vec = tiny_vocab.encode_caption(caption)
    assert vec.shape == (tiny_vocab.max_caption_length,)
    assert vec[0] == tiny_vocab.bos_idx
    assert vec[len(caption) + 1] == tiny_vocab.eos_idx
    assert (vec[len(caption) + 2 :] == tiny_vocab.padding_idx).all()
    # unknown words map to <unk>
    vec2 = tiny_vocab.encode_caption(["zzz_not_in_vocab"])
    assert vec2[1] == tiny_vocab.unk_idx


def test_decode_stops_at_eos_and_drops_specials(tiny_vocab):
    v = tiny_vocab
    word = v.itos[5]
    row = np.array(
        [v.bos_idx, 5, v.unk_idx, 5, v.eos_idx, 5, 5], dtype=np.int32
    )
    # pad to max length
    row = np.pad(row, (0, v.max_caption_length - len(row)))
    caps = v.decode_caption(row[None, :])
    assert caps == [f"{word} {word}"]


def test_max_caption_length_is_longest_plus_two(tiny_dataset_dir, tiny_vocab):
    import json

    longest = 0
    for split in ("train", "dev", "test"):
        with open(tiny_dataset_dir / f"{split}.json") as f:
            data = json.load(f)
        for ann in data["annotations"]:
            longest = max(longest, len(preprocess_caption(ann["caption"], None)))
    assert tiny_vocab.max_caption_length == longest + 2


def test_extend(tiny_vocab):
    import copy

    v = copy.deepcopy(tiny_vocab)
    n = len(v)

    class Other:
        itos = ["zzz_new_word", v.itos[5]]

    v.extend(Other())
    assert len(v) == n + 1
    assert v.stoi["zzz_new_word"] == n


def test_vocab_equality(tiny_dataset_dir):
    cfg = make_dataset_config(tiny_dataset_dir)
    v1, v2 = Vocab(cfg), Vocab(cfg)
    assert v1 == v2
