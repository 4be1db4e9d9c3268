"""ASR dataloader: bucketing iterator + padded collate + thread prefetch.

Replaces the reference torch DataLoader stack
(``neural_sp/datasets/asr/dataloader.py:10-88`` and the collate at
``build.py:73-105``) with a host-side pipeline tuned for XLA:

  * padded shapes are rounded up to configurable multiples so the number of
    distinct compiled shapes stays small (static-shape bucketing,
    SURVEY.md §7);
  * a background thread keeps one batch ahead of the device (double
    buffering on the host side);
  * label padding uses pad=3; feature padding is 0.0 after CMVN.
"""
from __future__ import annotations

import queue
import threading

import numpy as np

from ... import PAD
from .sampler import make_batches


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def collate(items, pad_xlen_multiple: int = 16, pad_ylen_multiple: int = 8,
            pad_batch_multiple: int = 1):
    """List of dataset items -> dict of padded numpy arrays + metadata.
    Emits ``ys_sub1``/``ys_sub2`` label tensors when the dataset carries
    sub-task converters (reference collate, asr/build.py:94-103)."""
    bs = len(items)
    bs_pad = _round_up(bs, pad_batch_multiple)
    xmax = _round_up(max(it["xs"].shape[0] for it in items), pad_xlen_multiple)
    ymax = _round_up(max(max(len(it["ys"]), 1) for it in items),
                     pad_ylen_multiple)
    dim = items[0]["xs"].shape[1]
    xs = np.zeros((bs_pad, xmax, dim), np.float32)
    ys = np.full((bs_pad, ymax), PAD, np.int32)
    xlens = np.zeros(bs_pad, np.int32)
    ylens = np.zeros(bs_pad, np.int32)
    for i, it in enumerate(items):
        t = it["xs"].shape[0]
        u = len(it["ys"])
        xs[i, :t] = it["xs"]
        ys[i, :u] = it["ys"]
        xlens[i] = t
        ylens[i] = u
    out = {
        "xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
        "utt_ids": [it["utt_id"] for it in items],
        "speakers": [it["speaker"] for it in items],
        "text": [it["text"] for it in items],
    }
    for sub in ("sub1", "sub2"):
        key = f"ys_{sub}"
        if key in items[0]:
            ymax_s = _round_up(max(max(len(it[key]), 1) for it in items),
                               pad_ylen_multiple)
            ys_s = np.full((bs_pad, ymax_s), PAD, np.int32)
            ylens_s = np.zeros(bs_pad, np.int32)
            for i, it in enumerate(items):
                u = len(it[key])
                ys_s[i, :u] = it[key]
                ylens_s[i] = u
            out[key] = ys_s
            out[f"ylens_{sub}"] = ylens_s
    if any("trigger_points" in it for it in items):
        # word/CTC alignment trigger frames; utterances WITHOUT an
        # alignment get -1 rows, which the latency loss masks out — a
        # single uncovered utterance must not drop the key for the whole
        # batch (that would silently skip the loss and flip the jit
        # signature between batches)
        tp = np.full((bs_pad, ymax), -1, np.int32)
        for i, it in enumerate(items):
            if "trigger_points" not in it:
                continue
            u = min(len(it["trigger_points"]), ymax)
            tp[i, :u] = it["trigger_points"][:u]
        out["trigger_points"] = tp
    return out


class ASRDataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        batch_size_type: str = "seq",
        dynamic_batching: bool = False,
        bucketing: str = "sort",
        seed: int = 1,
        num_replicas: int = 1,
        pad_xlen_multiple: int = 16,
        pad_ylen_multiple: int = 8,
        pad_batch_multiple: int = 1,
        prefetch: int = 2,
        longform_max_n_frames: int = 0,
        shape_grid_t: int = 0,
        sort_stop_epoch: int = 10000,
        n_stacks: int = 1,
        n_skips: int = 1,
        n_splices: int = 1,
    ):
        self.dataset = dataset
        # per-utterance frame stacking / splicing BEFORE batching
        # (reference applies them in encode(), speech2text.py:371-377; here
        # they live in the host loader so the device graph sees one shape)
        self.n_stacks = n_stacks
        self.n_skips = n_skips
        self.n_splices = n_splices
        self.batch_size = batch_size
        self.batch_size_type = batch_size_type
        self.dynamic_batching = dynamic_batching
        self.bucketing = bucketing
        self.seed = seed
        self.num_replicas = num_replicas
        self.pad_xlen_multiple = pad_xlen_multiple
        self.pad_ylen_multiple = pad_ylen_multiple
        self.pad_batch_multiple = pad_batch_multiple
        self.prefetch = prefetch
        self.longform_max_n_frames = longform_max_n_frames
        # shape_grid_t > 0: frame-bin batches bound the PADDED area on a
        # T grid (sampler._batch_size_padded_area); the feature padding
        # multiple follows the same grid so the compiled-shape set is the
        # grid ceilings, not per-batch maxima
        self.shape_grid_t = shape_grid_t
        if shape_grid_t > 0:
            self.pad_xlen_multiple = shape_grid_t
        self.sort_stop_epoch = sort_stop_epoch
        self.epoch = 0
        self._batches = self._make_batches()

    # -- vocab metadata carried on the loader (reference dataloader.py:30-60) --
    @property
    def vocab(self):
        return len(self.dataset.token2idx.token2idx) if hasattr(
            self.dataset.token2idx, "token2idx") else None

    @property
    def idx2token(self):
        return self.dataset.idx2token

    @property
    def vocab_sub1(self):
        c = getattr(self.dataset, "token2idx_sub1", None)
        return len(c.token2idx) if c is not None and \
            hasattr(c, "token2idx") else None

    @property
    def vocab_sub2(self):
        c = getattr(self.dataset, "token2idx_sub2", None)
        return len(c.token2idx) if c is not None and \
            hasattr(c, "token2idx") else None

    def _make_batches(self):
        # sorted batches accelerate early epochs; from sort_stop_epoch on,
        # the whole data is shuffled per epoch (reference
        # dataloader.py:72-86 sort -> shuffle switch)
        bucketing = self.bucketing
        if bucketing == "sort" and self.epoch >= self.sort_stop_epoch:
            bucketing = "shuffle"
        return make_batches(
            self.dataset.df,
            batch_size=self.batch_size,
            batch_size_type=self.batch_size_type,
            dynamic_batching=self.dynamic_batching,
            bucketing=bucketing,
            seed=self.seed + self.epoch,
            num_replicas=self.num_replicas,
            longform_max_n_frames=self.longform_max_n_frames,
            shape_grid_t=self.shape_grid_t,
        )

    def __len__(self):
        return len(self._batches)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self._batches = self._make_batches()

    def _transform(self, items):
        if self.n_stacks > 1 or self.n_skips > 1:
            from ...frontends.frame_stacking import stack_frame
            for it in items:
                it["xs"] = stack_frame(it["xs"], self.n_stacks, self.n_skips)
        if self.n_splices > 1:
            from ...frontends.splicing import splice
            for it in items:
                it["xs"] = splice(it["xs"], self.n_splices)
        return items

    def _load(self, batch):
        if self.n_stacks == 1 and self.n_skips == 1 and \
                self.n_splices == 1 and \
                getattr(self.dataset, "word_alignment_converter", None) \
                is None and not getattr(self.dataset, "ctc_alignment_dir",
                                        None):
            fast = self._load_native(batch)
            if fast is not None:
                return fast
        items = self._transform([self.dataset[i] for i in batch])
        return collate(items, self.pad_xlen_multiple, self.pad_ylen_multiple,
                       self.pad_batch_multiple)

    def _load_native(self, batch):
        """Fused C++ read+pad when all features are .npy files
        (native/nsp_native.cc nsp_collate_batch)."""
        from ...utils.native import collate_batch as native_collate
        from ... import PAD
        df = self.dataset.df
        rows = df.iloc[batch]
        paths = list(rows["feat_path"])
        if not all(isinstance(p, str) and p.endswith(".npy") for p in paths):
            return None
        xmax = int(rows["xlen"].max())
        xmax = -(-xmax // self.pad_xlen_multiple) * self.pad_xlen_multiple
        dim = int(rows["xdim"].iloc[0])
        bs_pad = -(-len(batch) // self.pad_batch_multiple) * \
            self.pad_batch_multiple
        out = native_collate(paths, [-1] * len(paths), xmax, dim)
        if out is None:
            return None
        xs_n, lens = out
        xs = np.zeros((bs_pad, xmax, dim), np.float32)
        xs[: len(batch)] = xs_n
        xlens = np.zeros(bs_pad, np.int32)
        xlens[: len(batch)] = lens
        ys_list = [self.dataset.token_ids(i) for i in batch]
        ymax = -(-max(max(len(y), 1) for y in ys_list)
                 // self.pad_ylen_multiple) * self.pad_ylen_multiple
        ys = np.full((bs_pad, ymax), PAD, np.int32)
        ylens = np.zeros(bs_pad, np.int32)
        for i, y in enumerate(ys_list):
            ys[i, : len(y)] = y
            ylens[i] = len(y)
        out = {
            "xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
            "utt_ids": list(rows["utt_id"]),
            "speakers": list(rows["speaker"]),
            "text": list(rows["text"]),
        }
        for sub in ("sub1", "sub2"):
            if getattr(self.dataset, f"token2idx_{sub}", None) is None:
                continue
            ys_l = [self.dataset.token_ids_sub(i, sub) for i in batch]
            ymax_s = -(-max(max(len(y), 1) for y in ys_l)
                       // self.pad_ylen_multiple) * self.pad_ylen_multiple
            ys_s = np.full((bs_pad, ymax_s), PAD, np.int32)
            ylens_s = np.zeros(bs_pad, np.int32)
            for i, yy in enumerate(ys_l):
                ys_s[i, : len(yy)] = yy
                ylens_s[i] = len(yy)
            out[f"ys_{sub}"] = ys_s
            out[f"ylens_{sub}"] = ylens_s
        return out

    def __iter__(self):
        if self.prefetch <= 0:
            for b in self._batches:
                yield self._load(b)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in self._batches:
                    q.put(self._load(b))
            finally:
                q.put(stop)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        th.join()
