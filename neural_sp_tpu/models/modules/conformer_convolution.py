"""Conformer convolution module (reference
``neural_sp/models/modules/conformer_convolution.py:17-129``):
pointwise -> GLU -> depthwise (optionally causal) -> norm -> swish -> pointwise.

Streaming: the depthwise conv needs (kernel-1) left-context frames; callers
pass the tail of the previous block as ``conv_cache`` (reference
conformer_block.py:163-166) and receive the updated tail back.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConformerConvBlock(nn.Module):
    d_model: int
    kernel_size: int = 15
    causal: bool = False
    normalization: str = "batch_norm"  # batch_norm | group_norm | layer_norm
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, pad_mask=None, conv_cache=None,
                 deterministic: bool = True, cur_len: int | None = None):
        """xs: [B, T, D]. Returns (out, cache).

        ``pad_mask`` is NOT used for per-utterance masking: the reference
        conv module (conformer_convolution.py:80-129, called unmasked from
        conformer_block.py:168) lets pad frames mix into valid frames near
        each utterance's boundary, and zeroing them here breaks
        converted-weight parity (tests/test_parity_pipeline.py). It IS used
        for the BATCH edge: the reference's arrays end at max(xlens), so
        its SAME padding feeds zeros into the depthwise conv there; under
        bucketed fixed-shape batches (sampler shape grid) our arrays extend
        past max(xlens), and without zeroing, conv-bias garbage in that
        tail would leak into the longest utterance's last valid frames —
        positions >= max(xlens) are therefore zeroed pre-conv, which is a
        no-op whenever T == max(xlens).

        ``cur_len``: in streaming, only the first cur_len frames of ``xs``
        are the committed current region — the returned cache is the tail of
        [conv_cache; xs[:cur_len]] so lookahead frames never pollute it.
        """
        h = nn.Dense(2 * self.d_model, name="pointwise1",
                     param_dtype=self.param_dtype)(xs)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        if pad_mask is not None and pad_mask.shape[-1] == h.shape[1]:
            # accepts either the precomputed [T] batch edge (encoders hoist
            # the reduction out of their layer scan — it would otherwise be
            # a tiny per-layer cross-DP collective) or a [B, T] pad mask
            edge = pad_mask if pad_mask.ndim == 1 else pad_mask.any(axis=0)
            h = jnp.where(edge[None, :, None], h, 0.0)

        k = self.kernel_size
        if self.causal:
            left, right = k - 1, 0
        else:
            left, right = (k - 1) // 2, k - 1 - (k - 1) // 2
        if conv_cache is not None:
            h_in = jnp.concatenate([conv_cache, h], axis=1)
            pad_l = 0
        else:
            h_in = h
            pad_l = left
        if left > 0:
            if cur_len is not None:
                m = conv_cache.shape[1] if conv_cache is not None else 0
                new_cache = h_in[:, :m + cur_len][:, -left:]
            else:
                new_cache = h_in[:, -left:]
        else:
            new_cache = None
        h = nn.Conv(self.d_model, (k,), padding=[(pad_l, right)],
                    feature_group_count=self.d_model, name="depthwise",
                    param_dtype=self.param_dtype)(h_in)
        if conv_cache is not None:
            h = h[:, -xs.shape[1]:]

        if self.normalization == "batch_norm":
            h = nn.BatchNorm(use_running_average=deterministic,
                             name="norm", param_dtype=self.param_dtype)(h)
        elif self.normalization == "group_norm":
            h = nn.GroupNorm(num_groups=1, name="norm",
                             param_dtype=self.param_dtype)(h)
        else:
            h = nn.LayerNorm(name="norm", param_dtype=self.param_dtype)(h)
        h = jax.nn.swish(h)
        h = nn.Dense(self.d_model, name="pointwise2",
                     param_dtype=self.param_dtype)(h)
        return h, new_cache
