"""Continuous integrate-and-fire (CIF) attention (reference
``neural_sp/models/modules/cif.py:16-160``): conv -> sigmoid alpha weights,
normalized firing in parallel (training) mode, incremental mode for
streaming.

TPU-first: the parallel integrate-and-fire segmentation is computed with
cumsum/floor bucketing instead of a frame loop — token index of frame t is
floor(cumsum(alpha))[t], and contexts are scatter-added per token.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class CIF(nn.Module):
    enc_dim: int
    conv_kernel_size: int = 3
    threshold: float = 1.0

    @nn.compact
    def __call__(self, eouts, elens, ylens=None, deterministic: bool = True):
        """eouts: [B, T, D]; ylens: [B] (training: alphas renormalised so
        each utterance fires exactly ylen times — reference 'scaled' mode).

        Returns (cv [B, U_max, D] integrated contexts, alpha [B, T],
        token_ids [B, T]).
        """
        bs, tmax, _ = eouts.shape
        h = nn.Conv(self.enc_dim, (self.conv_kernel_size,), padding="SAME",
                    name="conv")(eouts)
        alpha = jax.nn.sigmoid(
            nn.Dense(1, name="proj")(jax.nn.relu(h)))[..., 0]  # [B, T]
        valid = (jnp.arange(tmax)[None] < elens[:, None])
        alpha = jnp.where(valid, alpha, 0.0)

        if ylens is not None:
            # scale so sum(alpha) == ylen (training parity, cif.py 'resize')
            scale = ylens.astype(jnp.float32) / \
                jnp.maximum(alpha.sum(-1), 1e-6)
            alpha = alpha * scale[:, None]

        csum = jnp.cumsum(alpha, axis=-1)
        token_ids = jnp.floor(csum / self.threshold).astype(jnp.int32)
        # firing frame = where token index increments
        u_max = tmax if ylens is None else int(tmax)
        # integrate: cv[u] = sum_t alpha[t] * eouts[t] * 1[token_ids[t] == u]
        n_tokens = jnp.max(token_ids, axis=-1) + 1

        def integrate(one_alpha, one_ids, one_e):
            w = one_alpha[:, None] * one_e  # [T, D]
            return jax.ops.segment_sum(w, one_ids, num_segments=tmax)

        cv = jax.vmap(integrate)(alpha, token_ids, eouts)  # [B, T, D]
        return cv, alpha, token_ids, n_tokens
