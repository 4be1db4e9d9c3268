"""Location-based mixture-of-Gaussians monotonic attention (reference
``neural_sp/models/modules/gmm_attention.py:18-124``).

State: the mixture means ``myu_prev`` [B, n_mixtures] advance monotonically
(autoregressive positive increments), so the recurrent state is the means
rather than attention weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class GMMAttention(nn.Module):
    kdim: int
    qdim: int
    adim: int
    n_mixtures: int = 5
    vfloor: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, key, value, query, mask=None, myu_prev=None,
                 deterministic: bool = True):
        """query: [B, qdim]; myu_prev: [B, n_mix]. Returns (ctx, aw, myu)."""
        bs, tk = key.shape[:2]
        n = self.n_mixtures
        h = jnp.tanh(nn.Dense(self.adim, name="w_1",
                              param_dtype=self.param_dtype)(query))
        p = nn.Dense(3 * n, name="w_2", param_dtype=self.param_dtype)(h)
        w_logit, delta_raw, sigma_raw = jnp.split(p, 3, axis=-1)
        if myu_prev is None:
            myu_prev = jnp.zeros((bs, n), p.dtype)
        myu = myu_prev + jax.nn.softplus(delta_raw)         # monotonic advance
        sigma2 = jnp.maximum(jnp.exp(sigma_raw), self.vfloor)
        w_mix = jax.nn.softmax(w_logit, axis=-1)

        js = jnp.arange(tk, dtype=p.dtype)[None, :, None]   # [1, Tk, 1]
        num = -((js - myu[:, None, :]) ** 2) / (2.0 * sigma2[:, None, :])
        gauss = w_mix[:, None, :] * jnp.exp(num) / jnp.sqrt(
            2.0 * jnp.pi * sigma2[:, None, :])
        aw = jnp.sum(gauss, axis=-1)                        # [B, Tk]
        if mask is not None:
            aw = jnp.where(mask, aw, 0.0)
        ctx = jnp.einsum("bk,bkd->bd", aw, value)
        return ctx, aw, myu
