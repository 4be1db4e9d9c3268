"""Sequence/tensor helpers (reference ``neural_sp/models/torch_utils.py:12-148``)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import EOS, PAD


def append_sos_eos(ys: jnp.ndarray, ylens: jnp.ndarray,
                   bwd: bool = False) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ys: [B, U] padded with PAD -> (ys_in [B, U+1], ys_out [B, U+1], ylens+1).

    ys_in  = [eos, y1..yU, pad...]   (eos doubles as sos, reference
    torch_utils.py:69-101); ys_out = [y1..yU, eos, pad...].
    ``bwd`` reverses the label sequence (backward decoder).
    """
    bs, u = ys.shape
    if bwd:
        idx = jnp.arange(u)[None, :]
        rev_idx = jnp.clip(ylens[:, None] - 1 - idx, 0, u - 1)
        ys_r = jnp.take_along_axis(ys, rev_idx, axis=1)
        ys = jnp.where(idx < ylens[:, None], ys_r, PAD)
    ys_in = jnp.concatenate(
        [jnp.full((bs, 1), EOS, ys.dtype), ys], axis=1)
    ys_in = jnp.where(jnp.arange(u + 1)[None] <= ylens[:, None], ys_in, PAD)
    eos_col = jnp.full((bs, 1), PAD, ys.dtype)
    ys_out = jnp.concatenate([ys, eos_col], axis=1)
    pos = jnp.arange(u + 1)[None]
    ys_out = jnp.where(pos == ylens[:, None], EOS, ys_out)
    ys_out = jnp.where(pos > ylens[:, None], PAD, ys_out)
    return ys_in, ys_out, ylens + 1


def tile_batch(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B, ...] -> [B*n, ...] repeating each row n times (beam expansion)."""
    return jnp.repeat(x, n, axis=0)


def np_pad_lists(seqs: list[list[int]], pad: int = PAD,
                 min_len: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Ragged int lists -> (padded [B, U] int32, lens [B])."""
    u = max(max((len(s) for s in seqs), default=0), min_len)
    out = np.full((len(seqs), u), pad, np.int32)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s
        lens[i] = len(s)
    return out, lens
