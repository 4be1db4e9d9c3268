"""3-way speed perturbation (reference utils/speed_perturb_3way.sh:
sox speed 0.9/1.0/1.1 on the train split at the feature stage)."""
import os

import numpy as np

from neural_sp_tpu.utils.make_dataset import (
    speed_perturb_wave, sp_utt_id, expand_utts_for_speed,
    extract_features, make_vocab, make_tsv)
from neural_sp_tpu.utils.io import write_wav


def test_speed_perturb_wave_lengths_and_identity():
    x = np.sin(np.linspace(0, 40 * np.pi, 16000)).astype(np.float32)
    assert speed_perturb_wave(x, 1.0) is x
    fast = speed_perturb_wave(x, 1.1)
    slow = speed_perturb_wave(x, 0.9)
    assert abs(len(fast) - len(x) / 1.1) <= 1
    assert abs(len(slow) - len(x) / 0.9) <= 1
    # pitch scales with the factor: zero crossings PER SAMPLE increase
    # (total cycles are preserved, the clip just gets shorter/longer)
    zc = lambda v: np.sum(np.abs(np.diff(np.sign(v))) > 0) / len(v)
    assert zc(slow) < zc(x) < zc(fast)


def test_sp_utt_naming():
    assert sp_utt_id("u1", 1.0) == "u1"
    assert sp_utt_id("u1", 0.9) == "sp0.9-u1"
    utts = [{"utt_id": "u1", "speaker": "s", "text": "a b"}]
    out = expand_utts_for_speed(utts, (0.9, 1.0, 1.1))
    assert [u["utt_id"] for u in out] == ["sp0.9-u1", "u1", "sp1.1-u1"]
    assert all(u["speaker"] == "s" for u in out)


def test_extract_features_with_perturb_and_tsv(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    wav_scp = {}
    for i in range(2):
        w = rng.standard_normal(sr).astype(np.float32) * 0.1
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, w, sr)
        wav_scp[f"u{i}"] = p
    paths, lens, cmvn = extract_features(
        wav_scp, str(tmp_path / "feat"), speed_perturbs=(0.9, 1.0, 1.1))
    assert set(paths) == {"u0", "u1", "sp0.9-u0", "sp1.1-u0",
                          "sp0.9-u1", "sp1.1-u1"}
    # frame counts scale ~1/factor
    assert lens["sp0.9-u0"] > lens["u0"] > lens["sp1.1-u0"]

    texts = ["a b", "b a"]
    dict_path = str(tmp_path / "dict.txt")
    make_vocab(texts, "char", dict_path)
    utts = [{"utt_id": f"u{i}", "speaker": "s", "text": texts[i]}
            for i in range(2)]
    utts = expand_utts_for_speed(utts, (0.9, 1.0, 1.1))
    tsv = make_tsv(utts, paths, lens, dict_path, "char",
                   str(tmp_path / "train.tsv"))
    import pandas as pd
    df = pd.read_csv(tsv, sep="\t")
    assert len(df) == 6
    assert (df["speaker"] == "s").all()
