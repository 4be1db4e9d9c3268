"""Host scoring utilities (reference utils/ CLIs + TIMIT phone reduction).

Reference: utils/map2phone.py, utils/trn2ctm.py, utils/concat_ref.py,
utils/compute_oov_rate.py, examples/timit/s5/local/timit_norm_trans.pl +
conf/phones.60-48-39.map.
"""
import subprocess
import sys

from neural_sp_tpu.utils.scoring import (
    TIMIT_PHONE_MAP, timit_norm_trans, load_lexicon, map2phone_lines,
    parse_stm_segments, trn2ctm_lines, concat_ref_lines, compute_oov_rate)


class TestTimitNormTrans:
    def test_map_has_61_sources_and_39_targets(self):
        # 60 mapped rows + q (deleted) = the 61 training phones
        assert len(TIMIT_PHONE_MAP) == 60
        assert len({c48 for c48, _ in TIMIT_PHONE_MAP.values()}) == 48
        assert len({c39 for _, c39 in TIMIT_PHONE_MAP.values()}) == 39

    def test_61_to_39(self):
        # closures fold, q deleted, ax->ah, el->l (the perl pipeline rows)
        toks = "h# hh ah dx ux q el bcl b iy h#".split()
        assert timit_norm_trans(toks, to=39) == \
            "sil hh ah dx uw l sil b iy sil".split()

    def test_61_to_48_then_48_to_39_equals_direct(self):
        toks = [p for p in TIMIT_PHONE_MAP] + ["q"]
        via48 = timit_norm_trans(timit_norm_trans(toks, to=48),
                                 to=39, from_=48)
        assert via48 == timit_norm_trans(toks, to=39)

    def test_bad_args(self):
        import pytest
        with pytest.raises(ValueError):
            timit_norm_trans(["aa"], to=61)


class TestMap2Phone:
    def test_lexicon_and_unk(self, tmp_path):
        lex = tmp_path / "lexicon.txt"
        lex.write_text("HELLO hh ah l ow\nworld+n w er l d\nab a b\n")
        word2phone, max_n = load_lexicon(str(lex))
        assert word2phone["hello"] == "hh ah l ow"
        assert word2phone["world"] == "w er l d"  # CSJ '+pos' stripped
        assert max_n == 5
        lines = list(map2phone_lines(
            ["utt1  hello  world", "utt2 zzz"], word2phone, max_n,
            unk="NSN"))
        assert lines == ["utt1 hh ah l ow w er l d", "utt2 NSN"]

    def test_char_segmentation_longest_match(self):
        w2p = {"ab": "A B", "a": "A", "b": "B", "abc": "A B C"}
        lines = list(map2phone_lines(["u1 abcab"], w2p, max_n_char=3,
                                     word_segmentation=False))
        assert lines == ["u1 A B C A B"]


class TestTrn2Ctm:
    def test_plain(self):
        trn = ["hi there (spk1-utt_000100_000300)"]
        out = list(trn2ctm_lines(trn))
        # 2 s window / 2 words = 1 s per word, starting at 1.00 s
        assert out == ["spk1 1 1.00 1.00 hi 1.000",
                       "spk1 1 2.00 1.00 there 1.000"]

    def test_stm_end_time_fixup(self):
        stm = ["sw1_A 1 sw1_A 1.00 3.00 <o,f0,male> hi there",
               "; comment"]
        segs = parse_stm_segments(stm)
        trn = ["hi there (sw1_A-utt_000100_000250)"]
        out = list(trn2ctm_lines(trn, segs))
        # end from stm (3.00) not the utt id (2.50); channel A; _A stripped
        assert out == ["sw1 A 1.00 1.00 hi 1.000",
                       "sw1 A 2.00 1.00 there 1.000"]


class TestConcatRef:
    def test_speaker_concat_with_eos(self):
        utt2spk = {"u1": "spkA", "u2": "spkB", "u3": "spkA"}
        out = list(concat_ref_lines(
            ["u1 hello world", "u2 foo", "u3 bye"], utt2spk))
        assert out == ["spkA hello world <eos> bye", "spkB foo"]


class TestOovRate:
    def test_rate(self):
        wc = ["3 hello", "1 zzz", "2 (%hesitation)", "", "4 world"]
        rate, n_oov, n_words = compute_oov_rate(wc, {"hello", "world"})
        assert n_words == 8 and n_oov == 1
        assert abs(rate - 12.5) < 1e-9


class TestCli:
    def test_timit_norm_trans_trn_mode(self, tmp_path):
        trn = tmp_path / "hyp.trn"
        trn.write_text("h# q ih sil (f0-utt1)\n")
        r = subprocess.run(
            [sys.executable, "-m", "neural_sp_tpu.utils.scoring",
             "timit_norm_trans", "-i", str(trn), "--to", "39"],
            capture_output=True, text=True, check=True)
        assert r.stdout.strip() == "sil ih (f0-utt1)"

    def test_compute_oov_rate_cli(self, tmp_path):
        wc = tmp_path / "wc.txt"
        wc.write_text("2 a\n2 b\n")
        d = tmp_path / "dict.txt"
        d.write_text("a 1\n")
        r = subprocess.run(
            [sys.executable, "-m", "neural_sp_tpu.utils.scoring",
             "compute_oov_rate", str(wc), str(d), "dev"],
            capture_output=True, text=True, check=True)
        assert r.stdout.strip() == "dev: 50.000%"


def test_eval_unit_phone_map_reduces_per():
    """A 61-phone hyp differing from ref only within a 39-class (e.g. ao vs
    aa) scores PER 0 under timit_39 but PER>0 raw."""
    from neural_sp_tpu.evaluators.asr import eval_unit

    class FakeConf:
        state_carry_over = False

    class FakeSession:
        conf = FakeConf()

        def decode(self, xs, xlens):
            return [[0]]  # one hyp id per utt

    class FakeLoader:
        def idx2token(self, ids):
            return "aa kcl q iy"  # hyp (61-phone spellings)

        def __iter__(self):
            yield {"xs": None, "xlens": [100], "utt_ids": ["u1"],
                   "speakers": ["s"], "text": ["ao pcl iy"]}

    raw = eval_unit(FakeSession(), FakeLoader(), unit="phone")
    assert raw["wer"] > 0
    mapped = eval_unit(FakeSession(), FakeLoader(), unit="phone",
                       phone_map="timit_39")
    assert mapped["wer"] == 0
