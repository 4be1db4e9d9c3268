"""NIST SPHERE reading + STM parsing + segment-windowed feature extraction
(TEDLIUM stage-0; reference examples/tedlium/s5 data prep via Kaldi
sph2pipe/local scripts — here native)."""
import os

import numpy as np

from neural_sp_tpu.utils.io import read_sph, read_audio
from neural_sp_tpu.utils.make_dataset import parse_stm, extract_features


def _write_sph(path, samples_i16, sr=16000, coding="pcm", byte_fmt="01"):
    body = samples_i16.astype(
        np.dtype(np.int16).newbyteorder("<" if byte_fmt == "01" else ">")
    ).tobytes()
    hdr = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {sr}\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        f"sample_byte_format -s{len(byte_fmt)} {byte_fmt}\n"
        f"sample_coding -s{len(coding)} {coding}\n"
        f"sample_count -i {len(samples_i16)}\n"
        "end_head\n")
    with open(path, "wb") as f:
        f.write(hdr.encode().ljust(1024, b" "))
        f.write(body)


def test_read_sph_pcm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16000) * 8000).astype(np.int16)
    for fmt in ("01", "10"):
        p = str(tmp_path / f"a_{fmt}.sph")
        _write_sph(p, x, byte_fmt=fmt)
        got, sr = read_sph(p)
        assert sr == 16000
        np.testing.assert_allclose(got, x.astype(np.float32) / 32768.0,
                                   atol=1e-7)
    # extension dispatch
    got2, _ = read_audio(str(tmp_path / "a_01.sph"))
    np.testing.assert_array_equal(got2, got)


def test_read_sph_ulaw():
    # G.711 mu-law: encode with the audioop-free reference formula, decode
    # via read_sph's table; spot-check known codepoints
    from neural_sp_tpu.utils.io import _ulaw_table
    tab = _ulaw_table()
    assert tab.shape == (256,)
    # 0xFF encodes +0, 0x7F encodes -0
    assert abs(float(tab[0xFF])) < 1e-6
    assert abs(float(tab[0x7F])) < 1e-6
    # monotone magnitude growth within a segment
    seg = tab[[0xFF, 0xFE, 0xFD, 0xF0]]
    assert np.all(np.diff(-seg) > 0) or np.all(np.diff(seg) > 0)
    # sign symmetry: code ^ 0x80 flips sign
    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_allclose(tab[codes], -tab[codes ^ 0x80], atol=1e-7)


def test_parse_stm_and_segments(tmp_path):
    stm = tmp_path / "TalkA.stm"
    stm.write_text(
        ";; comment line\n"
        "TalkA 1 TalkA_spk 0.50 2.00 <o,f0,male> hello WORLD\n"
        "TalkA 1 TalkA_spk 2.50 3.00 <o,f0,male> ignore_time_segment_in_scoring\n"
        "TalkA 1 TalkA_spk 3.10 4.60 <o,f0,male> it 's fine\n")
    utts = parse_stm(str(stm))
    assert len(utts) == 2
    assert utts[0]["utt_id"] == "TalkA_spk-0000050-0000200"
    assert utts[0]["text"] == "hello world"
    assert utts[1]["text"] == "it's fine"
    assert utts[0]["rec"] == "TalkA"

    # segment-windowed extraction: 2 utts cut from one recording
    sr = 16000
    t = np.arange(5 * sr) / sr
    wav = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.int16)
    sph = str(tmp_path / "TalkA.sph")
    _write_sph(sph, wav, sr=sr)
    segments = {u["utt_id"]: (u["rec"], u["t0"], u["t1"]) for u in utts}
    paths, lens, cmvn = extract_features(
        {"TalkA": sph}, str(tmp_path / "feat"), segments=segments)
    assert set(paths) == {u["utt_id"] for u in utts}
    # 1.5 s at 10 ms hop ~ 148-150 frames
    assert 140 <= lens[utts[0]["utt_id"]] <= 155
    feat = np.load(paths[utts[1]["utt_id"]])
    assert feat.shape[1] == 80 and np.isfinite(feat).all()
