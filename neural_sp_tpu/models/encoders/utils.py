"""Encoder helpers: chunkwise reshaping for latency-controlled training
(reference ``neural_sp/models/seq2seq/encoders/utils.py:13-44``)."""
from __future__ import annotations

import jax.numpy as jnp


def chunkwise(xs: jnp.ndarray, n_left: int, n_current: int, n_right: int
              ) -> jnp.ndarray:
    """[B, T, D] -> [B * n_chunks, N_l + N_c + N_r, D] with zero edge pads.

    Chunk c covers frames [c*N_c - N_l, (c+1)*N_c + N_r). Core of the
    `reshape` streaming mode for LC-Transformer/Conformer.
    """
    bs, t, d = xs.shape
    n_chunks = (t + n_current - 1) // n_current
    pad_t = n_chunks * n_current - t
    xs_pad = jnp.pad(xs, ((0, 0), (n_left, pad_t + n_right), (0, 0)))
    win = n_left + n_current + n_right
    chunks = [
        jnp.expand_dims(
            jnp.roll(xs_pad, shift=-c * n_current, axis=1)[:, :win], 1)
        for c in range(n_chunks)
    ]
    out = jnp.concatenate(chunks, axis=1)  # [B, n_chunks, win, D]
    return out.reshape(bs * n_chunks, win, d)


def chunkwise_merge(ys: jnp.ndarray, bs: int, n_left: int, n_current: int,
                    n_right: int, t_out: int) -> jnp.ndarray:
    """Inverse of ``chunkwise`` keeping only each chunk's current region."""
    win = ys.shape[1]
    d = ys.shape[2]
    n_chunks = ys.shape[0] // bs
    ys = ys.reshape(bs, n_chunks, win, d)
    cur = ys[:, :, n_left:n_left + n_current]
    return cur.reshape(bs, n_chunks * n_current, d)[:, :t_out]
