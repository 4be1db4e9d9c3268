"""SpecAugment as a batched on-device op (reference
``neural_sp/models/seq2seq/frontends/spec_augment.py:12-140``).

Unlike the reference's per-utterance Python loops over torch tensors, masks
are built from broadcasted iota comparisons over the whole padded batch in a
single fused elementwise pass — no dynamic shapes, jit/vmap/pmap-safe.

Supports the reference's knobs: F (freq mask width), n_freq_masks, T (time
mask width), n_time_masks, p (adaptive upper bound on time-mask width as a
ratio of the utterance length), adaptive_number_ratio / adaptive_size_ratio
(SpecAugment-on-large-scale-datasets variants).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=(
    "freq_mask_width", "n_freq_masks", "time_mask_width", "n_time_masks",
    "p", "adaptive_number_ratio", "adaptive_size_ratio",
    "max_n_time_masks"))
def spec_augment(
    rng: jax.Array,
    xs: jnp.ndarray,
    xlens: jnp.ndarray,
    freq_mask_width: int = 27,
    n_freq_masks: int = 2,
    time_mask_width: int = 100,
    n_time_masks: int = 2,
    p: float = 1.0,
    adaptive_number_ratio: float = 0.0,
    adaptive_size_ratio: float = 0.0,
    max_n_time_masks: int = 20,
    replace_with_zero: bool = False,
) -> jnp.ndarray:
    """xs: [B, T, D] padded features; xlens: [B]. Returns masked copy.

    Masked bins are replaced with the per-utterance mean (reference default)
    or zero.
    """
    bs, tmax, dim = xs.shape
    fill = jnp.zeros((bs, 1, 1), xs.dtype)
    if not replace_with_zero:
        valid = (lax.broadcasted_iota(jnp.int32, (bs, tmax), 1)
                 < xlens[:, None]).astype(xs.dtype)
        fill = (jnp.sum(xs * valid[:, :, None], axis=(1, 2))
                / jnp.maximum(jnp.sum(valid, axis=1) * dim, 1.0))[:, None, None]

    n_t = n_time_masks
    if adaptive_number_ratio > 0:
        n_t = max_n_time_masks  # actual count gated per-utterance below

    keys = jax.random.split(rng, 4)
    mask = jnp.zeros((bs, tmax, dim), bool)

    # --- frequency masks ---
    if n_freq_masks > 0 and freq_mask_width > 0:
        f_width = jax.random.randint(
            keys[0], (bs, n_freq_masks, 1), 0, freq_mask_width + 1)
        f_start = (jax.random.uniform(keys[1], (bs, n_freq_masks, 1))
                   * jnp.maximum(dim - f_width, 1)).astype(jnp.int32)
        d_idx = lax.broadcasted_iota(jnp.int32, (1, 1, dim), 2)
        fmask = jnp.any(
            (d_idx >= f_start) & (d_idx < f_start + f_width), axis=1)  # [B, D]
        mask = mask | fmask[:, None, :]

    # --- time masks ---
    if n_t > 0 and (time_mask_width > 0 or adaptive_size_ratio > 0):
        if adaptive_size_ratio > 0:
            max_w = jnp.maximum(
                (adaptive_size_ratio * xlens).astype(jnp.int32), 1)[:, None, None]
        else:
            max_w = jnp.minimum(
                jnp.asarray(time_mask_width),
                jnp.maximum((p * xlens).astype(jnp.int32), 1))[:, None, None]
        t_width = (jax.random.uniform(keys[2], (bs, n_t, 1))
                   * (max_w + 1)).astype(jnp.int32)
        t_start = (jax.random.uniform(keys[3], (bs, n_t, 1))
                   * jnp.maximum(xlens[:, None, None] - t_width, 1)).astype(jnp.int32)
        if adaptive_number_ratio > 0:
            n_active = jnp.minimum(
                (adaptive_number_ratio * xlens).astype(jnp.int32),
                max_n_time_masks)
            active = (lax.broadcasted_iota(jnp.int32, (bs, n_t, 1), 1)
                      < n_active[:, None, None])
            t_width = jnp.where(active, t_width, 0)
        t_idx = lax.broadcasted_iota(jnp.int32, (1, 1, tmax), 2)
        tmask = jnp.any(
            (t_idx >= t_start) & (t_idx < t_start + t_width), axis=1)  # [B, T]
        mask = mask | tmask[:, :, None]

    return jnp.where(mask, fill.astype(xs.dtype), xs)
