"""LM dataset: corpus concatenation + BPTT windows (reference
``neural_sp/datasets/lm.py:22-169``).

The whole corpus is concatenated into a [B, stream_len] token matrix (utts
joined with <eos>); iteration yields (ys_in [B, bptt], ys_out [B, bptt])
windows with state carried across windows by the trainer. Supports backward
(reversed) LMs and serialized (dialogue-ordered) mode.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .. import EOS
from .asr.dataset import build_converters


class LMDataset:
    def __init__(
        self,
        tsv_path: str,
        dict_path: str,
        unit: str = "word",
        wp_model: str | None = None,
        batch_size: int = 32,
        bptt: int = 64,
        backward: bool = False,
        serialize: bool = False,
        num_replicas: int = 1,
    ):
        self.bptt = bptt
        self.batch_size = batch_size * num_replicas
        self.backward = backward
        self.token2idx, self.idx2token = build_converters(
            unit, dict_path, wp_model)
        df = pd.read_csv(tsv_path, sep="\t", dtype={"text": str}).fillna(
            {"text": ""})
        if serialize:
            df = df.sort_values("utt_id", kind="stable")
        ids: list[int] = []
        for _, row in df.iterrows():
            tid = row.get("token_id", None)
            utt = [int(t) for t in str(tid).split()] if isinstance(
                tid, str) and tid and tid != "nan" else \
                self.token2idx(row["text"])
            ids.extend(utt + [EOS])
        if backward:
            ids = ids[::-1]
        n = (len(ids) - 1) // self.batch_size
        self.n_tokens = len(ids)
        data = np.asarray(ids[: n * self.batch_size + 1], np.int32)
        self.xs = data[:-1][: n * self.batch_size].reshape(
            self.batch_size, n)
        ys = data[1:][: n * self.batch_size].reshape(self.batch_size, n)
        self.ys = ys

    @property
    def vocab(self):
        return len(self.token2idx.token2idx) if hasattr(
            self.token2idx, "token2idx") else None

    def __len__(self):
        return max((self.xs.shape[1] + self.bptt - 1) // self.bptt, 0)

    def __iter__(self):
        for i in range(0, self.xs.shape[1], self.bptt):
            yield (self.xs[:, i:i + self.bptt],
                   self.ys[:, i:i + self.bptt])
