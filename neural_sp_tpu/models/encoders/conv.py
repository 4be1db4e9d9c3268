"""Convolutional frontend encoder (reference
``neural_sp/models/seq2seq/encoders/conv.py:18-505``): 1D/2D conv blocks
(2 convs + optional max-pool each), layer/batch norm, bridge bottleneck,
subsampling-factor & streaming context-size calculation.

TPU-first notes: NHWC layout ([B, T, F, C]) so XLA maps convs onto the MXU;
length bookkeeping uses ceil semantics with tail padding (no frames dropped,
padded region masked downstream).
"""
from __future__ import annotations

import ast
from dataclasses import dataclass, field

import jax.numpy as jnp
import flax.linen as nn
from ...ops.dropout import Dropout


@dataclass
class CNNConfig:
    channels: list = field(default_factory=list)        # [int]
    kernel_sizes: list = field(default_factory=list)    # [(kt, kf)]
    strides: list = field(default_factory=list)         # [(st, sf)]
    poolings: list = field(default_factory=list)        # [(pt, pf)]


def parse_cnn_config(channels: str, kernel_sizes: str, strides: str,
                     poolings: str) -> CNNConfig:
    """Parse reference-style strings, e.g. channels "32_32",
    kernel_sizes "(3,3)_(3,3)", poolings "(2,2)_(2,2)"
    (reference conv.py:480-505)."""
    def parse_pairs(s):
        return [tuple(ast.literal_eval(p)) if "(" in p else (int(p), int(p))
                for p in s.split("_")] if s else []

    cfg = CNNConfig()
    cfg.channels = [int(c) for c in channels.split("_")] if channels else []
    cfg.kernel_sizes = parse_pairs(kernel_sizes)
    cfg.strides = parse_pairs(strides)
    cfg.poolings = parse_pairs(poolings)
    n = len(cfg.channels)
    cfg.kernel_sizes = (cfg.kernel_sizes or [(3, 3)] * n)[:n]
    cfg.strides = (cfg.strides or [(1, 1)] * n)[:n]
    cfg.poolings = (cfg.poolings or [(1, 1)] * n)[:n]
    return cfg


def _ceil_div_lens(xlens, factor: int):
    return jnp.ceil(xlens.astype(jnp.float32) / factor).astype(jnp.int32)


def _edge_fill(h: jnp.ndarray, t_valid, fill: float) -> jnp.ndarray:
    """Overwrite frames at positions >= t_valid (the BATCH edge) with
    ``fill``. Under bucketed fixed-shape batches T can exceed max(xlens);
    the reference's arrays end exactly at max(xlens), so its SAME conv
    padding sees zeros (and its ceil max-pool sees -1e9 tail pads) there —
    this reproduces that edge so bucket-padded batches compute the same
    valid frames as packed ones. No-op when T == max(xlens)."""
    if t_valid is None:
        return h
    idx = jnp.arange(h.shape[1]) < t_valid
    return jnp.where(idx.reshape((1, -1) + (1,) * (h.ndim - 2)), h, fill)


def _pool_time(xs: jnp.ndarray, pt: int, pf: int) -> jnp.ndarray:
    """Max-pool [B, T, F, C] with tail padding (ceil semantics)."""
    b, t, f, c = xs.shape
    pad_t, pad_f = (-t) % pt, (-f) % pf
    if pad_t or pad_f:
        xs = jnp.pad(xs, ((0, 0), (0, pad_t), (0, pad_f), (0, 0)),
                     constant_values=-1e9)
    return nn.max_pool(xs, (pt, pf), strides=(pt, pf), padding="VALID")


class Conv2dBlock(nn.Module):
    """conv3x3 -> norm -> relu -> conv3x3 -> norm -> relu -> maxpool
    (reference conv.py:289-396)."""
    channels: int
    kernel: tuple = (3, 3)
    stride: tuple = (1, 1)
    pooling: tuple = (1, 1)
    normalization: str = ""      # '' | layer_norm | batch_norm
    dropout: float = 0.0

    @nn.compact
    def __call__(self, xs, deterministic: bool = True, t_valid=None):
        for i in range(2):
            stride = self.stride if i == 0 else (1, 1)
            xs = _edge_fill(xs, t_valid, 0.0)  # conv sees the packed edge
            xs = nn.Conv(self.channels, self.kernel, strides=stride,
                         padding="SAME", name=f"conv{i+1}")(xs)
            if i == 0 and stride[0] > 1 and t_valid is not None:
                t_valid = _ceil_div_lens(t_valid, stride[0])
            if self.normalization == "layer_norm":
                xs = nn.LayerNorm(name=f"norm{i+1}")(xs)
            elif self.normalization == "batch_norm":
                xs = nn.BatchNorm(use_running_average=deterministic,
                                  name=f"norm{i+1}")(xs)
            xs = nn.relu(xs)
            xs = Dropout(self.dropout)(xs, deterministic=deterministic)
        if max(self.pooling) > 1:
            # straddling pool windows must ignore beyond-edge positions just
            # like the packed batch's -1e9 ceil-pad tail
            xs = _edge_fill(xs, t_valid, -1e9)
            xs = _pool_time(xs, *self.pooling)
        return xs


class Conv1dBlock(nn.Module):
    """1D variant over [B, T, D] (reference conv.py:198-286)."""
    channels: int
    kernel: int = 3
    stride: int = 1
    pooling: int = 1
    normalization: str = ""
    dropout: float = 0.0

    @nn.compact
    def __call__(self, xs, deterministic: bool = True, t_valid=None):
        for i in range(2):
            stride = self.stride if i == 0 else 1
            xs = _edge_fill(xs, t_valid, 0.0)  # conv sees the packed edge
            xs = nn.Conv(self.channels, (self.kernel,), strides=(stride,),
                         padding="SAME", name=f"conv{i+1}")(xs)
            if i == 0 and stride > 1 and t_valid is not None:
                t_valid = _ceil_div_lens(t_valid, stride)
            if self.normalization == "layer_norm":
                xs = nn.LayerNorm(name=f"norm{i+1}")(xs)
            elif self.normalization == "batch_norm":
                xs = nn.BatchNorm(use_running_average=deterministic,
                                  name=f"norm{i+1}")(xs)
            xs = nn.relu(xs)
            xs = Dropout(self.dropout)(xs, deterministic=deterministic)
        if self.pooling > 1:
            xs = _edge_fill(xs, t_valid, -1e9)
            b, t, d = xs.shape
            pad = (-t) % self.pooling
            if pad:
                xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1e9)
            xs = xs.reshape(b, -1, self.pooling, d).max(2)
        return xs


class ConvEncoder(nn.Module):
    """CNN frontend; returns (xs [B, T', d_out], xlens)."""
    input_dim: int
    channels: str = "32_32"
    kernel_sizes: str = "(3,3)_(3,3)"
    strides: str = "(1,1)_(1,1)"
    poolings: str = "(2,2)_(2,2)"
    conv_dim: int = 2                 # 1 | 2
    normalization: str = ""
    dropout: float = 0.0
    bottleneck_dim: int = 0           # bridge output dim (0 = none)
    param_init: float = 0.1

    @property
    def cfg(self) -> CNNConfig:
        return parse_cnn_config(self.channels, self.kernel_sizes,
                                self.strides, self.poolings)

    @property
    def subsampling_factor(self) -> int:
        f = 1
        for (st, _), (pt, _) in zip(self.cfg.strides, self.cfg.poolings):
            f *= st * max(pt, 1)
        return f

    def context_size(self) -> tuple[int, int]:
        """(lookback, lookahead) in input frames for streaming
        (reference calculate_context_size, conv.py:140-159)."""
        left = right = 0
        factor = 1
        for (kt, _), (st, _), (pt, _) in zip(
                self.cfg.kernel_sizes, self.cfg.strides, self.cfg.poolings):
            for _ in range(2):
                left += (kt - 1) // 2 * factor
                right += (kt - 1) // 2 * factor
            factor *= st * max(pt, 1)
        return left, right

    def output_dim(self) -> int:
        if self.bottleneck_dim > 0:
            return self.bottleneck_dim
        if self.conv_dim == 1:
            return self.cfg.channels[-1]
        freq = self.input_dim
        for (_, sf), (_, pf) in zip(self.cfg.strides, self.cfg.poolings):
            freq = -(-freq // sf)
            if pf > 1:
                freq = -(-freq // pf)
        return freq * self.cfg.channels[-1]

    @nn.compact
    def __call__(self, xs, xlens, deterministic: bool = True):
        cfg = self.cfg
        # batch edge for bucket-padded inputs (see _edge_fill): frames at
        # positions >= max(xlens) are treated exactly like the reference's
        # array end so T > max(xlens) computes the same valid frames
        t_valid = jnp.max(xlens)
        if self.conv_dim == 2:
            h = xs[..., None]  # [B, T, F, 1]
            for i, ch in enumerate(cfg.channels):
                h = Conv2dBlock(ch, cfg.kernel_sizes[i], cfg.strides[i],
                                cfg.poolings[i], self.normalization,
                                self.dropout, name=f"block{i}")(
                    h, deterministic, t_valid)
                xlens = _ceil_div_lens(
                    xlens, cfg.strides[i][0] * max(cfg.poolings[i][0], 1))
                t_valid = _ceil_div_lens(
                    t_valid, cfg.strides[i][0] * max(cfg.poolings[i][0], 1))
            b, t, f, c = h.shape
            h = h.reshape(b, t, f * c)
        else:
            h = xs
            for i, ch in enumerate(cfg.channels):
                h = Conv1dBlock(ch, cfg.kernel_sizes[i][0], cfg.strides[i][0],
                                cfg.poolings[i][0], self.normalization,
                                self.dropout, name=f"block{i}")(
                    h, deterministic, t_valid)
                xlens = _ceil_div_lens(
                    xlens, cfg.strides[i][0] * max(cfg.poolings[i][0], 1))
                t_valid = _ceil_div_lens(
                    t_valid, cfg.strides[i][0] * max(cfg.poolings[i][0], 1))
        # don't let the pool's -1e9 edge fill escape into downstream blocks
        h = _edge_fill(h, t_valid, 0.0)
        if self.bottleneck_dim > 0:
            h = nn.Dense(self.bottleneck_dim, name="bridge")(h)
        return h, xlens
