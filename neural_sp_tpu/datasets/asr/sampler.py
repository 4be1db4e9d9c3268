"""Batch assembly: dynamic batch sizing + bucketing strategies.

Re-implements reference ``neural_sp/datasets/asr/sampler.py:28-150`` and
``neural_sp/datasets/utils.py:19-177``:
  * seq batch size with dynamic length scaling (_set_batch_size_seq)
  * frame-/token-bin batch sizes (_set_batch_size_bin) — the TPU-preferred
    mode: ~constant B*T area keeps padded-shape variety (and hence XLA
    recompiles) small
  * sort / shuffle / discourse / longform bucketing
  * rank striping for multi-host data sharding (reference sampler.py:96)
"""
from __future__ import annotations

import numpy as np


def _batch_size_seq(df, offset: int, base_bs: int, dynamic: bool,
                    num_replicas: int = 1) -> int:
    if not dynamic:
        return base_bs
    xlen = int(df["xlen"].iloc[offset])
    # reference datasets/utils.py:19-33 thresholds
    if xlen <= 800:
        scale = 1.0
    elif xlen <= 1600:
        scale = 0.5
    else:
        scale = 0.25
    bs = max(int(base_bs * scale), 1)
    return max(bs - bs % num_replicas, num_replicas) if num_replicas > 1 else bs


def _batch_size_bin(df, offset: int, batch_bin: int, key: str,
                    num_replicas: int = 1) -> int:
    """#utts s.t. sum of `key` (xlen frames or ylen tokens) <= batch_bin."""
    total, bs = 0, 0
    n = len(df)
    while offset + bs < n:
        total += int(df[key].iloc[offset + bs])
        if total > batch_bin and bs > 0:
            break
        bs += 1
        if total > batch_bin:
            break
    bs = max(bs, 1)
    if num_replicas > 1:
        bs = max(bs - bs % num_replicas, num_replicas)
    return bs


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _batch_size_padded_area(df, offset: int, batch_bin: int, grid_t: int,
                            num_replicas: int = 1, grid_b: int = 4) -> int:
    """#utts s.t. the PADDED batch area bs * round_up(max xlen, grid_t)
    stays <= batch_bin.

    TPU-native refinement of the frame-bin mode: the budget constrains the
    tensor XLA actually compiles and the MXU actually multiplies (batch x
    padded-T), not the raw frame sum, so every bucket dispatches ~the same
    work and pad frames are bounded by the grid quantisation (~grid_t/2
    per utt) instead of the batch length spread. Requires df sorted by
    xlen (ascending or descending): the running max is then the first or
    last element scanned, making the greedy scan exact."""
    n = len(df)
    bs = 0
    tmax = 0
    while offset + bs < n:
        tmax_new = max(tmax, int(df["xlen"].iloc[offset + bs]))
        if (bs + 1) * _round_up(tmax_new, grid_t) > batch_bin and bs > 0:
            break
        bs += 1
        tmax = tmax_new
    # quantise bs DOWN to the grid (excess utts fall to the next batch —
    # no pad rows) so the compiled-shape set stays small
    if bs > grid_b:
        bs -= bs % grid_b
    bs = max(bs, 1)
    if num_replicas > 1:
        bs = max(bs - bs % num_replicas, num_replicas)
    return bs


def make_batches(
    df,
    batch_size: int = 1,
    batch_size_type: str = "seq",     # seq | frame | token
    dynamic_batching: bool = False,
    bucketing: str = "sort",          # sort | shuffle | discourse | longform
    seed: int = 1,
    num_replicas: int = 1,
    longform_max_n_frames: int = 0,
    shape_grid_t: int = 0,            # >0: frame budget bounds PADDED area
) -> list[list[int]]:
    """Partition df row positions into batches (lists of int positions)."""
    n = len(df)
    batches: list[list[int]] = []
    if bucketing == "discourse":
        # group utterances by their position within each session
        # (reference datasets/utils.py discourse_bucketing)
        order = {}
        for pos, utt_id in enumerate(df["utt_id"]):
            sess = utt_id.rsplit("_", 1)[0]
            order.setdefault(sess, []).append(pos)
        max_len = max(len(v) for v in order.values()) if order else 0
        for k in range(max_len):
            group = [v[k] for v in order.values() if len(v) > k]
            for i in range(0, len(group), batch_size):
                batches.append(group[i:i + batch_size])
        return batches

    if bucketing == "longform":
        assert longform_max_n_frames > 0
        cur, cur_frames = [], 0
        for pos in range(n):
            xlen = int(df["xlen"].iloc[pos])
            if cur and cur_frames + xlen > longform_max_n_frames:
                batches.append(cur)
                cur, cur_frames = [], 0
            cur.append(pos)
            cur_frames += xlen
        if cur:
            batches.append(cur)
        return batches

    offset = 0
    while offset < n:
        if batch_size_type == "seq":
            bs = _batch_size_seq(df, offset, batch_size, dynamic_batching,
                                 num_replicas)
        elif batch_size_type == "frame" and shape_grid_t > 0:
            bs = _batch_size_padded_area(df, offset, batch_size,
                                         shape_grid_t, num_replicas)
        elif batch_size_type == "frame":
            bs = _batch_size_bin(df, offset, batch_size, "xlen", num_replicas)
        elif batch_size_type == "token":
            bs = _batch_size_bin(df, offset, batch_size, "ylen", num_replicas)
        else:
            raise ValueError(batch_size_type)
        batches.append(list(range(offset, min(offset + bs, n))))
        offset += bs

    if bucketing == "shuffle":
        rng = np.random.default_rng(seed)
        rng.shuffle(batches)
    return batches


def stripe_for_rank(batch: list[int], rank: int, num_replicas: int) -> list[int]:
    """Split one global batch across replicas (reference sampler.py:96)."""
    return batch[rank::num_replicas]
