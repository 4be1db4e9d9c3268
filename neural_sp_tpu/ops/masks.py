"""Padding / attention mask utilities (TPU-first: static shapes, boolean masks).

Functional equivalents of the reference's mask helpers:
  - ``make_pad_mask``        <- neural_sp/models/torch_utils.py:51-67
  - ``make_san_mask``        <- neural_sp/models/seq2seq/encoders/transformer.py:633-649
  - ``causal_mask``          <- transformer.py:652-665
  - ``make_chunkwise_san_mask`` <- transformer.py:668-686 (streaming `mask` mode)

All masks are boolean with True = attend / valid, matching jnp.where semantics.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] int lengths -> [B, max_len] bool mask, True for valid frames."""
    idx = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return idx < lengths.astype(jnp.int32)[:, None]


def make_san_mask(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """Self-attention mask from a pad mask.

    [B, T] -> [B, T, T]; position (b, q, k) is True iff key k is valid —
    KEYS ONLY, exactly like the reference (transformer.py:633-648 repeats
    the key-pad row over every query, so pad queries still attend valid
    keys). This matters numerically: the conformer depthwise conv mixes
    pad-position attention outputs back into valid frames near the
    boundary, so query-masking here would diverge from the reference
    (caught by tests/test_parity_pipeline.py). It is also safer: no
    all-masked softmax rows.
    """
    t = pad_mask.shape[1]
    return jnp.broadcast_to(pad_mask[:, None, :], (pad_mask.shape[0], t, t))


def causal_mask(qlen: int, klen: int | None = None, offset: int = 0) -> jnp.ndarray:
    """[qlen, klen] lower-triangular causal mask.

    ``offset`` shifts the query positions (query i attends keys <= i+offset);
    used for streaming decode where the query block starts mid-sequence.
    """
    if klen is None:
        klen = qlen
    q = lax.broadcasted_iota(jnp.int32, (qlen, klen), 0)
    k = lax.broadcasted_iota(jnp.int32, (qlen, klen), 1)
    return k <= q + offset


def lookahead_mask(qlen: int, klen: int | None = None, lookahead: int = 0) -> jnp.ndarray:
    """Causal mask allowing ``lookahead`` future frames."""
    return causal_mask(qlen, klen, offset=lookahead)


def make_chunkwise_san_mask(
    pad_mask: jnp.ndarray,
    chunk_size_left: int,
    chunk_size_current: int,
    chunk_size_right: int,
) -> jnp.ndarray:
    """Chunkwise (latency-controlled) self-attention mask, streaming `mask` mode.

    Each frame t belongs to chunk c = t // N_c; it may attend frames in
    [c*N_c - N_l, (c+1)*N_c + N_r), intersected with the pad mask.
    N_l < 0 (e.g. -1) means unlimited left context.
    """
    bs, tmax = pad_mask.shape
    t_idx = lax.broadcasted_iota(jnp.int32, (tmax, tmax), 0)  # query
    k_idx = lax.broadcasted_iota(jnp.int32, (tmax, tmax), 1)  # key
    chunk = t_idx // max(chunk_size_current, 1)
    lo = chunk * chunk_size_current - chunk_size_left
    hi = (chunk + 1) * chunk_size_current + chunk_size_right
    m = k_idx < hi
    if chunk_size_left >= 0:
        m = m & (k_idx >= lo)
    m = m[None] & make_san_mask(pad_mask)
    return m


def apply_mask_logits(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Set masked-out logits to a large negative (dtype-safe) value."""
    neg = jnp.asarray(jnp.finfo(logits.dtype).min / 2, logits.dtype)
    return jnp.where(mask, logits, neg)
