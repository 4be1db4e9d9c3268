"""TSV-backed ASR dataset (reference ``neural_sp/datasets/asr/dataset.py:35-359``).

TSV schema (parity with reference ``utils/make_tsv.py:91``):
  utt_id \t speaker \t feat_path \t xlen \t xdim \t text \t token_id \t ylen \t ydim

feat_path may be .npy, .npz:key, kaldi 'ark:offset', or .wav (fbank on load).
"""
from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from ...utils.io import load_feat
from ..token_converter.character import Char2idx, Idx2char
from ..token_converter.word import Word2idx, Idx2word
from ..token_converter.phone import Phone2idx, Idx2phone
from ..token_converter.wordpiece import Wp2idx, Idx2wp

logger = logging.getLogger(__name__)


def build_converters(unit: str, dict_path: str, wp_model: str | None = None,
                     nlsyms=None):
    """(text->ids, ids->text) pair for a token unit."""
    if unit == "word":
        return Word2idx(dict_path), Idx2word(dict_path)
    if unit in ("wp", "wordpiece"):
        return Wp2idx(dict_path, wp_model), Idx2wp(dict_path, wp_model)
    if unit in ("char", "character"):
        return Char2idx(dict_path, nlsyms=nlsyms), Idx2char(dict_path)
    if unit == "phone":
        return Phone2idx(dict_path), Idx2phone(dict_path)
    raise ValueError(f"unknown unit: {unit}")


class ASRDataset:
    def __init__(
        self,
        tsv_path: str,
        dict_path: str,
        unit: str = "char",
        wp_model: str | None = None,
        nlsyms=None,
        min_n_frames: int = 1,
        max_n_frames: int = 10**9,
        subsample_factor: int = 1,
        is_test: bool = False,
        sort_by: str | None = None,       # input | output | None
        short2long: bool = False,
        ctc_alignment_dir: str | None = None,
        use_tsv_token_ids: bool = True,
        dict_path_sub1: str | None = None,
        unit_sub1: str = "char",
        wp_model_sub1: str | None = None,
        dict_path_sub2: str | None = None,
        unit_sub2: str = "char",
        wp_model_sub2: str | None = None,
        word_alignment_dir: str | None = None,
    ):
        # NOTE: the TSV token_id column is unit-specific (the reference writes
        # one TSV per unit). Set use_tsv_token_ids=False to re-tokenize `text`
        # with this dataset's converter instead.
        self.use_tsv_token_ids = use_tsv_token_ids
        self.unit = unit
        self.token2idx, self.idx2token = build_converters(
            unit, dict_path, wp_model, nlsyms)
        # hierarchical MTL sub-task converters (reference dataset.py attaches
        # per-sub-task token ids; collate emits ys_sub1/ys_sub2,
        # asr/build.py:94-103)
        self.token2idx_sub1 = self.token2idx_sub2 = None
        self.idx2token_sub1 = self.idx2token_sub2 = None
        if dict_path_sub1:
            self.token2idx_sub1, self.idx2token_sub1 = build_converters(
                unit_sub1, dict_path_sub1, wp_model_sub1, nlsyms)
        if dict_path_sub2:
            self.token2idx_sub2, self.idx2token_sub2 = build_converters(
                unit_sub2, dict_path_sub2, wp_model_sub2, nlsyms)
        df = pd.read_csv(tsv_path, sep="\t", dtype={"utt_id": str,
                                                    "speaker": str,
                                                    "text": str})
        df = df.fillna({"text": ""})
        n0 = len(df)
        if not is_test:
            df = df[df["xlen"].between(min_n_frames, max_n_frames)]
            # CTC length compatibility (reference dataset.py:161-198)
            if subsample_factor > 1:
                df = df[df["ylen"] <= df["xlen"] // subsample_factor]
        if len(df) != n0:
            logger.info("removed %d utterances (length filters)", n0 - len(df))
        if sort_by == "input":
            df = df.sort_values("xlen", ascending=short2long, kind="stable")
        elif sort_by == "output":
            df = df.sort_values("ylen", ascending=short2long, kind="stable")
        self.df = df.reset_index(drop=True)
        self.subsample_factor = subsample_factor
        self.ctc_alignment_dir = ctc_alignment_dir
        # word-alignment -> token-boundary triggers for MinLT latency
        # training (reference dataset.py:248-262 + alignment.py:12-98)
        self.word_alignment_converter = None
        self.word_alignment_dir = word_alignment_dir
        if word_alignment_dir:
            from ..alignment import WordAlignmentConverter
            enc = getattr(self.token2idx, "_bpe", None)
            encode = enc.encode if enc is not None else \
                (lambda w: list(w))  # char fallback: one piece per char
            self.word_alignment_converter = WordAlignmentConverter(encode)

    def __len__(self):
        return len(self.df)

    @property
    def n_frames_total(self) -> int:
        return int(self.df["xlen"].sum())

    def token_ids(self, i: int) -> np.ndarray:
        row = self.df.iloc[i]
        tid = row.get("token_id", None) if self.use_tsv_token_ids else None
        if isinstance(tid, str) and tid:
            return np.asarray([int(t) for t in tid.split()], np.int32)
        return np.asarray(self.token2idx(row["text"]), np.int32)

    def token_ids_sub(self, i: int, sub: str) -> np.ndarray | None:
        conv = getattr(self, f"token2idx_{sub}")
        if conv is None:
            return None
        return np.asarray(conv(self.df.iloc[i]["text"]), np.int32)

    def __getitem__(self, i: int):
        row = self.df.iloc[i]
        feat = load_feat(row["feat_path"])
        out = {
            "utt_id": row["utt_id"],
            "speaker": row["speaker"],
            "xs": feat.astype(np.float32),
            "ys": self.token_ids(i),
            "text": row["text"],
        }
        for sub in ("sub1", "sub2"):
            ys_s = self.token_ids_sub(i, sub)
            if ys_s is not None:
                out[f"ys_{sub}"] = ys_s
        if self.word_alignment_converter is not None:
            tp = self.word_alignment_converter(
                self.word_alignment_dir, row["speaker"], row["utt_id"],
                row["text"])
            if tp is not None:
                # word alignments are INPUT-frame indices (10 ms); the
                # latency loss compares encoder-output frames (reference
                # divides at load, dataset.py:305-314). CTC alignments are
                # already encoder frames and are NOT divided.
                tp = np.minimum(tp, max(int(row["xlen"]) - 1, 0))
                out["trigger_points"] = tp // self.subsample_factor
        elif self.ctc_alignment_dir:
            from ..alignment import load_ctc_alignment
            tp = load_ctc_alignment(self.ctc_alignment_dir, row["speaker"],
                                    row["utt_id"])
            if tp is not None:
                out["trigger_points"] = tp
        return out
