"""Positional embeddings (reference
``neural_sp/models/modules/positional_embedding.py:18-140``).

  * sinusoidal absolute PE with a streaming offset;
  * XL-style inverse-frequency relative PE (cache-length aware);
  * 1d-conv positional encoding option is provided by the encoders directly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from ...ops.dropout import Dropout


def sinusoidal_table(max_len: int, d_model: int, offset: int = 0) -> np.ndarray:
    """[max_len, d_model] standard sin/cos table starting at ``offset``."""
    pos = np.arange(offset, offset + max_len, dtype=np.float32)[:, None]
    inv = np.exp(np.arange(0, d_model, 2, np.float32)
                 * -(np.log(10000.0) / d_model))
    tab = np.zeros((max_len, d_model), np.float32)
    tab[:, 0::2] = np.sin(pos * inv)
    tab[:, 1::2] = np.cos(pos * inv)
    return tab


class PositionalEncoding(nn.Module):
    """Add absolute sinusoidal PE (pe_type: add | none); scaled by sqrt(d)."""
    d_model: int
    pe_type: str = "add"
    dropout: float = 0.0
    scale_input: bool = True

    @nn.compact
    def __call__(self, xs: jnp.ndarray, offset=0,
                 deterministic: bool = True) -> jnp.ndarray:
        """``offset`` may be a python int or a traced scalar (streaming —
        avoids a recompile per block position)."""
        if self.scale_input:
            xs = xs * jnp.asarray(np.sqrt(self.d_model), xs.dtype)
        if self.pe_type in ("add", "1dconv3L_add"):
            pos = (jnp.arange(xs.shape[1], dtype=jnp.float32)
                   + jnp.asarray(offset, jnp.float32))[:, None]
            inv = jnp.exp(jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
                          * -(np.log(10000.0) / self.d_model))
            tab = jnp.zeros((xs.shape[1], self.d_model), jnp.float32)
            tab = tab.at[:, 0::2].set(jnp.sin(pos * inv))
            tab = tab.at[:, 1::2].set(jnp.cos(pos * inv))
            xs = xs + tab[None].astype(xs.dtype)
        xs = Dropout(self.dropout)(xs, deterministic=deterministic)
        return xs


def xl_relative_positions(qlen: int, klen: int, d_model: int,
                          clamp_len: int = -1) -> np.ndarray:
    """[klen, d_model] Transformer-XL relative PE for distances
    klen-1 .. 0 (most distant first), with optional distance clamping
    (reference ``XLPositionalEmbedding.forward`` :118-140)."""
    rel = np.arange(klen - 1, -1, -1, dtype=np.float32)
    if clamp_len > 0:
        rel = np.minimum(rel, clamp_len)
    inv = np.exp(np.arange(0, d_model, 2, np.float32)
                 * -(np.log(10000.0) / d_model))
    tab = np.zeros((klen, d_model), np.float32)
    tab[:, 0::2] = np.sin(rel[:, None] * inv)
    tab[:, 1::2] = np.cos(rel[:, None] * inv)
    return tab
