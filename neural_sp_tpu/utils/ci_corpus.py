"""Synthetic tiny corpus generator — the framework's analog of the
reference's committed ci_test corpus (``examples/ci_test``, SURVEY.md §2.9).

Generates deterministic word-tone audio (each word is a unique tone motif,
so the acoustics genuinely encode the transcript and tiny models can learn
it), extracts fbank features, applies global CMVN, and writes the standard
TSV + dict + BPE-model artifacts used by training/eval CLIs and tests.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .io import write_wav, logmel_fbank_np
from ..ops.audio import compute_cmvn_stats
from ..datasets.token_converter.wordpiece import train_bpe

WORDS = ["aba", "bec", "cid", "dof", "egu", "fih", "gon", "huk"]


def _word_wave(word_idx: int, sr: int = 16000, dur: float = 0.18,
               rng=None) -> np.ndarray:
    t = np.arange(int(sr * dur)) / sr
    f0 = 300.0 + 150.0 * word_idx
    x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
    env = np.minimum(np.arange(len(t)) / (0.01 * sr), 1.0)
    env *= np.minimum((len(t) - np.arange(len(t))) / (0.01 * sr), 1.0)
    x = x * env
    if rng is not None:
        x = x + 0.01 * rng.standard_normal(len(t))
    return x.astype(np.float32)


def make_ci_corpus(
    root: str,
    n_train: int = 40,
    n_dev: int = 8,
    n_test: int = 8,
    max_words: int = 5,
    seed: int = 7,
    wp_vocab_size: int = 40,
) -> dict:
    """Create {train,dev,test}.tsv + dict_char.txt/dict_word.txt + wp.json.

    Returns a dict of artifact paths.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    wav_dir = os.path.join(root, "wav")
    feat_dir = os.path.join(root, "feat")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)

    sets = {"train": n_train, "dev": n_dev, "test": n_test}
    utts = {}
    all_feats = []
    for name, n in sets.items():
        rows = []
        for i in range(n):
            n_words = int(rng.integers(1, max_words + 1))
            widx = rng.integers(0, len(WORDS), n_words)
            text = " ".join(WORDS[w] for w in widx)
            sr = 16000
            sil = np.zeros(int(0.05 * sr), np.float32)
            wave = np.concatenate(
                [sil] + [np.concatenate([_word_wave(int(w), sr, rng=rng),
                                         sil]) for w in widx])
            utt_id = f"{name}_{i:04d}"
            wav_path = os.path.join(wav_dir, utt_id + ".wav")
            write_wav(wav_path, wave, sr)
            feat = logmel_fbank_np(wave, sample_rate=sr)
            all_feats.append(feat)
            rows.append((utt_id, f"spk{i % 4}", feat, text))
        utts[name] = rows

    mean, std = compute_cmvn_stats(all_feats)
    np.save(os.path.join(root, "cmvn_mean.npy"), mean)
    np.save(os.path.join(root, "cmvn_std.npy"), std)

    # dictionaries
    chars = sorted({c for w in WORDS for c in w})
    dict_char = os.path.join(root, "dict_char.txt")
    with open(dict_char, "w") as f:
        idx = 4
        for c in chars + ["<space>"]:
            f.write(f"{c} {idx}\n")
            idx += 1
    dict_word = os.path.join(root, "dict_word.txt")
    with open(dict_word, "w") as f:
        for i, w in enumerate(WORDS):
            f.write(f"{w} {i + 4}\n")

    # BPE wordpiece model + dict
    wp_model = os.path.join(root, "wp.json")
    train_texts = [r[3] for r in utts["train"]]
    model = train_bpe(train_texts, wp_vocab_size, wp_model)
    dict_wp = os.path.join(root, "dict_wp.txt")
    with open(dict_wp, "w") as f:
        for i, p in enumerate(model["vocab"]):
            if i >= 4:
                f.write(f"{p} {i}\n")

    from ..datasets.token_converter.character import Char2idx
    from ..datasets.token_converter.word import Word2idx
    from ..datasets.token_converter.wordpiece import Wp2idx
    converters = {
        "": (Char2idx(dict_char), 4 + len(chars) + 1),       # default: char
        "_wp": (Wp2idx(dict_wp, wp_model), len(model["vocab"])),
        "_word": (Word2idx(dict_word), 4 + len(WORDS)),
    }
    paths = {"dict_char": dict_char, "dict_word": dict_word,
             "dict_wp": dict_wp, "wp_model": wp_model,
             "cmvn_mean": os.path.join(root, "cmvn_mean.npy"),
             "cmvn_std": os.path.join(root, "cmvn_std.npy")}
    for name, rows in utts.items():
        feats_cached = {}
        for utt_id, spk, feat, text in rows:
            feat = (feat - mean) / std
            fpath = os.path.join(feat_dir, utt_id + ".npy")
            np.save(fpath, feat.astype(np.float32))
            feats_cached[utt_id] = (fpath, feat.shape)
        # one TSV per token unit (the reference writes unit-specific TSVs)
        for suffix, (conv, ydim) in converters.items():
            recs = []
            for utt_id, spk, feat, text in rows:
                fpath, shape = feats_cached[utt_id]
                ids = conv(text)
                recs.append({
                    "utt_id": utt_id, "speaker": spk, "feat_path": fpath,
                    "xlen": shape[0], "xdim": shape[1], "text": text,
                    "token_id": " ".join(map(str, ids)), "ylen": len(ids),
                    "ydim": ydim,
                })
            tsv = os.path.join(root, f"{name}{suffix}.tsv")
            pd.DataFrame(recs).to_csv(tsv, sep="\t", index=False)
            paths[name + suffix] = tsv
    return paths
