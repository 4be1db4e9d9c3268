"""Native SentencePiece .model reading (reference wordpiece.py:28-29 loads
these via the C++ library; here the protobuf is parsed directly)."""
import os

import pytest

from neural_sp_tpu.datasets.token_converter.spm_model import (
    SentencePieceModel, parse_spm_model, write_spm_model,
    TYPE_UNKNOWN, TYPE_CONTROL)
from neural_sp_tpu.datasets.token_converter.wordpiece import Wp2idx, Idx2wp

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_unigram.model")


def _unigram_pieces():
    # layout mirrors spm defaults: <unk>=0 (UNKNOWN), <s>=1, </s>=2 (CONTROL)
    return [
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("<s>", 0.0, TYPE_CONTROL),
        ("</s>", 0.0, TYPE_CONTROL),
        ("▁the", -1.0), ("▁cat", -2.0), ("▁c", -4.0), ("at", -3.5),
        ("▁", -5.0), ("t", -6.0), ("h", -6.0), ("e", -6.0),
        ("c", -6.0), ("a", -6.0), ("s", -6.5),
    ]


@pytest.fixture(scope="module")
def unigram_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spm") / "uni.model")
    write_spm_model(_unigram_pieces(), path, "unigram")
    return path


def test_wire_roundtrip(unigram_model):
    pieces, mtype = parse_spm_model(unigram_model)
    assert mtype == "unigram"
    assert pieces[0] == ("<unk>", 0.0, TYPE_UNKNOWN)
    assert ("▁the", -1.0, 1) in pieces


def test_unigram_viterbi(unigram_model):
    sp = SentencePieceModel(unigram_model)
    # "the cat" -> best segmentation is the two whole-word pieces
    assert sp.encode_as_pieces("the cat") == ["▁the", "▁cat"]
    # "cats": ▁cat(-2) + s(-6.5) beats ▁c + at + s
    assert sp.encode_as_pieces("cats") == ["▁cat", "s"]
    ids = sp.encode_as_ids("the cat")
    assert [sp.id_to_piece(i) for i in ids] == ["▁the", "▁cat"]
    assert sp.decode_pieces(["▁the", "▁cat", "s"]) == "the cats"


def test_unigram_unk_fallback(unigram_model):
    sp = SentencePieceModel(unigram_model)
    # 'x' is not in the vocab; segmentation still succeeds, id maps to unk
    pieces = sp.encode_as_pieces("tax")
    assert "x" in pieces
    ids = sp.encode_as_ids("tax")
    assert sp.unk_id in ids


def test_bpe_merge_order(tmp_path):
    # BPE scores encode merge priority (higher = earlier merge)
    path = str(tmp_path / "bpe.model")
    write_spm_model([
        ("<unk>", 0.0, TYPE_UNKNOWN),
        ("▁a", -1.0), ("ab", -2.0), ("▁ab", -3.0),
        ("▁", -9.0), ("a", -9.0), ("b", -9.0),
    ], path, "bpe")
    sp = SentencePieceModel(path)
    assert sp.model_type == "bpe"
    # ▁,a,b -> merge ▁a first (score -1), then ▁a+b has no piece '▁ab'?
    # '▁ab' exists (-3.0): ▁a+b -> ▁ab
    assert sp.encode_as_pieces("ab") == ["▁ab"]


def test_wp2idx_idx2wp_native_spm(unigram_model):
    wp = Wp2idx(None, unigram_model)
    iw = Idx2wp(None, unigram_model)
    ids = wp("the cat")
    assert iw(ids) == "the cat"
    assert iw(ids, return_list=True) == ["▁the", "▁cat"]


def test_committed_fixture():
    """The checked-in fixture keeps parity verifiable without the writer."""
    assert os.path.exists(FIXTURE)
    sp = SentencePieceModel(FIXTURE)
    assert sp.encode_as_pieces("the cat") == ["▁the", "▁cat"]
    wp = Wp2idx(None, FIXTURE)
    iw = Idx2wp(None, FIXTURE)
    assert iw(wp("the cats")) == "the cats"


def test_nfkc_normalization(unigram_model):
    sp = SentencePieceModel(unigram_model)
    # full-width latin + repeated spaces normalize before segmentation
    assert sp.encode_as_pieces("ｔｈｅ  ｃａｔ") == ["▁the", "▁cat"]
