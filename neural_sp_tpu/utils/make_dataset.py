"""Corpus preparation utilities (reference ``utils/make_tsv.py``,
``make_vocab.sh``, ``compute_oov_rate.py``): wav+transcript -> features,
CMVN, vocab (char/word/BPE), TSV — the pure-Python/TPU analog of the Kaldi
stage-1/2 recipe pipeline."""
from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pandas as pd

from .io import read_audio, logmel_fbank_np
from ..ops.audio import compute_cmvn_stats
from ..datasets.token_converter.wordpiece import train_bpe
from ..datasets.asr.dataset import build_converters

TSV_COLUMNS = ["utt_id", "speaker", "feat_path", "xlen", "xdim", "text",
               "token_id", "ylen", "ydim"]


def speed_perturb_wave(x: np.ndarray, factor: float) -> np.ndarray:
    """sox-style ``speed`` perturbation (resample: duration /= factor,
    pitch *= factor) — reference ``utils/speed_perturb_3way.sh:1-40``
    applies sox speed 0.9/1.0/1.1 at the feature stage."""
    if factor == 1.0:
        return x
    n_out = int(round(len(x) / factor))
    idx = np.arange(n_out, dtype=np.float64) * factor
    return np.interp(idx, np.arange(len(x)), x).astype(np.float32)


def sp_utt_id(utt: str, factor: float) -> str:
    """Kaldi/reference naming: 'sp0.9-<utt>'; 1.0 keeps the original id."""
    return utt if factor == 1.0 else f"sp{factor:g}-{utt}"


def expand_utts_for_speed(utts: list[dict], factors) -> list[dict]:
    """Duplicate utterance records per perturbation factor (train set)."""
    out = []
    for f in factors:
        for u in utts:
            u2 = dict(u)
            u2["utt_id"] = sp_utt_id(u["utt_id"], f)
            out.append(u2)
    return out


def extract_features(
    wav_scp: dict[str, str],
    feat_dir: str,
    n_mels: int = 80,
    cmvn: tuple | None = None,
    speed_perturbs=(),
    segments: dict[str, tuple] | None = None,
) -> tuple[dict[str, str], dict[str, int], tuple]:
    """wav_scp: utt_id -> wav path. Returns (feat paths, lens, cmvn).

    ``speed_perturbs``: e.g. (0.9, 1.0, 1.1) — 3-way speed perturbation
    (train set only; reference run.sh:138-147 + speed_perturb_3way.sh);
    perturbed copies get 'sp<f>-' utt-id prefixes.

    ``segments``: Kaldi-style utterance windows into long recordings
    (TEDLIUM/swbd/ami stage-0): utt_id -> (rec_id, t_begin_s, t_end_s),
    with ``wav_scp`` keyed by rec_id. Each recording decodes once."""
    os.makedirs(feat_dir, exist_ok=True)
    factors = tuple(speed_perturbs) or (1.0,)
    raw = {}
    if segments:
        for rec, path in wav_scp.items():
            utts = [(u, s) for u, s in segments.items() if s[0] == rec]
            if not utts:
                continue
            x, sr = read_audio(path)
            for utt, (_, t0, t1) in utts:
                seg = x[int(round(t0 * sr)): int(round(t1 * sr))]
                for f in factors:
                    raw[sp_utt_id(utt, f)] = logmel_fbank_np(
                        speed_perturb_wave(seg, f), sample_rate=sr,
                        n_mels=n_mels)
    else:
        for utt, path in wav_scp.items():
            x, sr = read_audio(path)
            for f in factors:
                raw[sp_utt_id(utt, f)] = logmel_fbank_np(
                    speed_perturb_wave(x, f), sample_rate=sr, n_mels=n_mels)
    if cmvn is None:
        cmvn = compute_cmvn_stats(list(raw.values()))
    mean, std = cmvn
    paths, lens = {}, {}
    for utt, feat in raw.items():
        feat = ((feat - mean) / std).astype(np.float32)
        p = os.path.join(feat_dir, utt + ".npy")
        np.save(p, feat)
        paths[utt] = p
        lens[utt] = feat.shape[0]
    return paths, lens, cmvn


def parse_stm(path: str) -> list[dict]:
    """Parse an NIST STM transcript file (TEDLIUM stage-0; reference
    examples/tedlium/s5 data prep via Kaldi local scripts): lines
    ``<rec> <chan> <spk> <t0> <t1> [<label>] words...``. Returns utterance
    dicts with Kaldi-style ids ``<spk>-<t0cs:07d>-<t1cs:07d>``; segments
    marked ignore_time_segment_in_scoring are dropped."""
    utts = []
    for line in open(path, encoding="utf-8", errors="replace"):
        line = line.strip()
        if not line or line.startswith(";;"):
            continue
        parts = line.split(None, 6)
        if len(parts) < 6:
            continue
        rec, _chan, spk, t0, t1 = parts[:5]
        rest = parts[5] if len(parts) == 6 else " ".join(parts[5:])
        if rest.startswith("<"):
            label, _, rest = rest.partition(">")
            if "ignore_time_segment_in_scoring" in label:
                continue
            rest = rest.strip()
        if not rest or rest == "ignore_time_segment_in_scoring":
            continue
        t0, t1 = float(t0), float(t1)
        utt = f"{spk}-{int(round(t0 * 100)):07d}-{int(round(t1 * 100)):07d}"
        utts.append({"utt_id": utt, "speaker": spk, "rec": rec,
                     "t0": t0, "t1": t1,
                     "text": rest.replace(" '", "'").lower()})
    return utts


def make_vocab(texts, unit: str, out_path: str, vocab_size: int = 0,
               wp_model_path: str | None = None) -> str:
    """Build a dict file (and BPE model for unit='wp'); ids start at 4."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    if unit == "wp":
        assert wp_model_path and vocab_size > 0
        model = train_bpe(texts, vocab_size, wp_model_path)
        with open(out_path, "w") as f:
            for i, p in enumerate(model["vocab"]):
                if i >= 4:
                    f.write(f"{p} {i}\n")
        return out_path
    counter: Counter = Counter()
    for t in texts:
        if unit == "char":
            counter.update(c for c in t if c != " ")
        else:
            counter.update(t.split())
    items = [w for w, _ in counter.most_common(vocab_size or None)]
    with open(out_path, "w") as f:
        idx = 4
        for w in items:
            f.write(f"{w} {idx}\n")
            idx += 1
        if unit == "char":
            f.write(f"<space> {idx}\n")
    return out_path


def make_tsv(
    utts: list[dict],
    feat_paths: dict[str, str],
    feat_lens: dict[str, int],
    dict_path: str,
    unit: str,
    out_tsv: str,
    wp_model: str | None = None,
    xdim: int = 80,
) -> str:
    """utts: [{utt_id, speaker, text}] -> reference-schema TSV
    (utils/make_tsv.py:91)."""
    tok, _ = build_converters(unit, dict_path, wp_model)
    vocab = len(open(dict_path).readlines()) + 4
    recs = []
    for u in utts:
        ids = tok(u["text"])
        recs.append({
            "utt_id": u["utt_id"], "speaker": u.get("speaker", "spk"),
            "feat_path": feat_paths[u["utt_id"]],
            "xlen": feat_lens[u["utt_id"]], "xdim": xdim,
            "text": u["text"], "token_id": " ".join(map(str, ids)),
            "ylen": len(ids), "ydim": vocab})
    pd.DataFrame(recs, columns=TSV_COLUMNS).to_csv(out_tsv, sep="\t",
                                                   index=False)
    return out_tsv


def compute_oov_rate(texts, dict_path: str) -> float:
    """% of word tokens not in the dict (reference compute_oov_rate.py)."""
    vocab = {line.split()[0] for line in open(dict_path)}
    n_oov = n_tok = 0
    for t in texts:
        for w in t.split():
            n_tok += 1
            n_oov += w not in vocab
    return 100.0 * n_oov / max(n_tok, 1)
