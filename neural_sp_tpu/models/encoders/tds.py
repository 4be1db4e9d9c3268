"""Time-depth separable (TDS) convolutional encoder (reference
``neural_sp/models/seq2seq/encoders/tds.py:23-280``): SubsampleBlocks
(time-stride 2) interleaved with TDSBlocks (2D conv over time + pointwise
2-layer FC, each with residual + LayerNorm over channelxfreq). Fixed total
subsampling = 2^(#subsample blocks), reference uses 8.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .subsampling import new_lens
from ...ops.dropout import Dropout


class TDSBlock(nn.Module):
    channels: int
    kernel_t: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        """xs: [B, T, F, C]."""
        b, t, f, c = xs.shape
        h = nn.Conv(self.channels, (self.kernel_t, 1), padding="SAME",
                    name="conv")(xs)
        h = nn.relu(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        xs = xs + h
        xs = nn.LayerNorm(reduction_axes=(-2, -1), name="norm1")(xs)
        # pointwise 2-layer FC over flattened (F*C)
        hf = xs.reshape(b, t, f * c)
        h = nn.relu(nn.Dense(f * c, name="fc1")(hf))
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(f * c, name="fc2")(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        xs = (hf + h).reshape(b, t, f, c)
        return nn.LayerNorm(reduction_axes=(-2, -1), name="norm2")(xs)


class SubsampleBlock(nn.Module):
    channels: int
    kernel_t: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, xs, deterministic: bool = True):
        xs = nn.Conv(self.channels, (self.kernel_t, 1), strides=(2, 1),
                     padding="SAME", name="conv")(xs)
        xs = nn.relu(xs)
        xs = Dropout(self.dropout)(xs, deterministic=deterministic)
        return nn.LayerNorm(reduction_axes=(-2, -1), name="norm")(xs)


class TDSEncoder(nn.Module):
    """channels/kernels per stage, e.g. channels="10_10_14_14_18_18_18_18",
    with '_'-separated per-layer values; a stage starts with a SubsampleBlock
    whenever the channel count changes (reference uses 3 subsample stages)."""
    input_dim: int
    channels: str = "10_10_14_14_18_18"
    kernel_sizes: str = "21_21_21_21_21_21"
    dropout: float = 0.0
    last_proj_dim: int = 0

    @property
    def _chs(self):
        return [int(c) for c in self.channels.split("_")]

    @property
    def _kts(self):
        return [int(k) for k in self.kernel_sizes.split("_")]

    @property
    def subsampling_factor(self) -> int:
        f = 1
        prev = None
        for c in self._chs:
            if c != prev:
                f *= 2
            prev = c
        return f

    @property
    def output_dim(self) -> int:
        if self.last_proj_dim > 0:
            return self.last_proj_dim
        return self._chs[-1] * self.input_dim

    @nn.compact
    def __call__(self, xs, xlens, task: str = "all",
                 deterministic: bool = True):
        h = xs[..., None]  # [B, T, F, 1]
        prev = None
        for i, (c, kt) in enumerate(zip(self._chs, self._kts)):
            if c != prev:
                h = SubsampleBlock(c, kt, self.dropout,
                                   name=f"subsample{i}")(h, deterministic)
                xlens = new_lens(xlens, 2)
                prev = c
            h = TDSBlock(c, kt, self.dropout, name=f"tds{i}")(h, deterministic)
        b, t, f, c = h.shape
        h = h.reshape(b, t, f * c)
        if self.last_proj_dim > 0:
            h = nn.Dense(self.last_proj_dim, name="bridge")(h)
        return {"ys": {"xs": h, "xlens": xlens}}
