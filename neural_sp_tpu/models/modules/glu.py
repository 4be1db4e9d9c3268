"""GLU building blocks (reference ``neural_sp/models/modules/glu.py``):
LinearGLUBlock (FC-GLU) and ConvGLUBlock (weight-normalised conv GLU with
residual, used by the gated-conv encoder/LM)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from ...ops.dropout import Dropout


class LinearGLUBlock(nn.Module):
    size: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(2 * self.size, param_dtype=self.param_dtype)(xs)
        a, b = jnp.split(h, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


class ConvGLUBlock(nn.Module):
    """1D conv GLU over time with optional bottleneck + residual."""
    kernel_size: int
    in_ch: int
    out_ch: int
    bottleneck_dim: int = 0
    dropout: float = 0.0
    causal: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """xs: [B, T, C]."""
        residual = xs
        h = xs
        if self.bottleneck_dim > 0:
            h = nn.Dense(self.bottleneck_dim, param_dtype=self.param_dtype)(h)
        pad = (self.kernel_size - 1, 0) if self.causal else \
            ((self.kernel_size - 1) // 2, self.kernel_size // 2)
        h = nn.Conv(2 * (self.bottleneck_dim or self.out_ch),
                    (self.kernel_size,), padding=[pad],
                    param_dtype=self.param_dtype)(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        if self.bottleneck_dim > 0:
            h = nn.Dense(self.out_ch, param_dtype=self.param_dtype)(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        if residual.shape[-1] == h.shape[-1]:
            h = (h + residual) * jnp.sqrt(0.5).astype(h.dtype)
        return h
