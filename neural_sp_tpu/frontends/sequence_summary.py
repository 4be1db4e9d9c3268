"""Sequence summary network (reference
``neural_sp/models/seq2seq/frontends/sequence_summary.py:19-82``): 3-layer
MLP -> time-average over valid frames -> residual add (speaker/environment
adaptation)."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.masks import make_pad_mask
from ..ops.dropout import Dropout


class SequenceSummaryNetwork(nn.Module):
    n_units: int = 256
    n_layers: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, xs, xlens, deterministic: bool = True):
        d_in = xs.shape[-1]
        h = xs
        for i in range(self.n_layers - 1):
            h = nn.tanh(nn.Dense(self.n_units, name=f"fc{i}")(h))
            h = Dropout(self.dropout)(h, deterministic=deterministic)
        mask = make_pad_mask(xlens, xs.shape[1]).astype(xs.dtype)[..., None]
        mean = jnp.sum(h * mask, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1), 1.0)
        s = nn.Dense(d_in, name="fc_out")(mean)
        return xs + s[:, None, :]
