"""Interlayer time-subsampling ops (reference
``neural_sp/models/seq2seq/encoders/subsampling.py:13-250``):
concat / conv1d (strided) / drop / add / max_pool / mean_pool, each updating
lengths. All are static-shape jnp ops over padded batches.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def _pad_to_multiple(xs: jnp.ndarray, factor: int) -> jnp.ndarray:
    t = xs.shape[1]
    pad = (-t) % factor
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    return xs


def new_lens(xlens, factor: int):
    return jnp.ceil(xlens.astype(jnp.float32) / factor).astype(jnp.int32)


class DropSubsampler(nn.Module):
    factor: int

    def __call__(self, xs, xlens):
        if self.factor == 1:
            return xs, xlens
        return xs[:, ::self.factor], new_lens(xlens, self.factor)


class AddSubsampler(nn.Module):
    factor: int

    def __call__(self, xs, xlens):
        if self.factor == 1:
            return xs, xlens
        xs = _pad_to_multiple(xs, self.factor)
        b, t, d = xs.shape
        xs = xs.reshape(b, t // self.factor, self.factor, d).sum(2)
        return xs, new_lens(xlens, self.factor)


class MaxPoolSubsampler(nn.Module):
    factor: int

    def __call__(self, xs, xlens):
        if self.factor == 1:
            return xs, xlens
        xs = _pad_to_multiple(xs, self.factor)
        b, t, d = xs.shape
        xs = xs.reshape(b, t // self.factor, self.factor, d).max(2)
        return xs, new_lens(xlens, self.factor)


class MeanPoolSubsampler(nn.Module):
    factor: int

    def __call__(self, xs, xlens):
        if self.factor == 1:
            return xs, xlens
        xs = _pad_to_multiple(xs, self.factor)
        b, t, d = xs.shape
        xs = xs.reshape(b, t // self.factor, self.factor, d).mean(2)
        return xs, new_lens(xlens, self.factor)


class ConcatSubsampler(nn.Module):
    """Concat ``factor`` consecutive frames then project back (w/ tanh)."""
    factor: int
    d_out: int

    @nn.compact
    def __call__(self, xs, xlens):
        if self.factor == 1:
            return xs, xlens
        xs = _pad_to_multiple(xs, self.factor)
        b, t, d = xs.shape
        xs = xs.reshape(b, t // self.factor, self.factor * d)
        xs = jnp.tanh(nn.Dense(self.d_out, name="proj")(xs))
        return xs, new_lens(xlens, self.factor)


class Conv1dSubsampler(nn.Module):
    """Strided 1D conv subsampling."""
    factor: int
    d_out: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, xs, xlens):
        if self.factor == 1:
            return xs, xlens
        xs = nn.Conv(self.d_out, (self.kernel_size,),
                     strides=(self.factor,), padding="SAME",
                     name="conv")(xs)
        return xs, new_lens(xlens, self.factor)


def build_subsampler(stype: str, factor: int, d_out: int) -> nn.Module:
    if stype == "drop":
        return DropSubsampler(factor)
    if stype == "add":
        return AddSubsampler(factor)
    if stype == "max_pool":
        return MaxPoolSubsampler(factor)
    if stype == "mean_pool":
        return MeanPoolSubsampler(factor)
    if stype == "concat":
        return ConcatSubsampler(factor, d_out)
    if stype in ("conv1d", "1dconv"):
        return Conv1dSubsampler(factor, d_out)
    raise ValueError(f"unknown subsampling type: {stype}")
