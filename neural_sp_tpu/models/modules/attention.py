"""Single-head attention mechanisms for the LAS decoder (reference
``neural_sp/models/modules/attention.py:11-181``): location / add / dot /
luong_dot / luong_general / luong_concat, plus triggered-attention masking
and sigmoid smoothing.

State protocol: location attention carries the previous attention weights
``aw_prev`` [B, Tk]; all variants precompute the projected keys once per
utterance via ``precompute()`` (returned as ``key_cache``), so the per-token
decode step does no key-side matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.masks import apply_mask_logits
from ...ops.dropout import Dropout


class AttentionMechanism(nn.Module):
    kdim: int
    qdim: int
    adim: int
    atype: str = "location"
    conv_out_channels: int = 10
    conv_kernel_size: int = 201
    sharpening_factor: float = 1.0
    sigmoid_smoothing: bool = False
    dropout: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        a = self.atype
        if a in ("location", "add"):
            # reference w_key HAS a bias for add/location (attention.py:41,44)
            self.w_key = nn.Dense(self.adim, use_bias=True,
                                  param_dtype=self.param_dtype)
            self.w_query = nn.Dense(self.adim, use_bias=False,
                                    param_dtype=self.param_dtype)
            self.v = nn.Dense(1, use_bias=False, param_dtype=self.param_dtype)
        if a == "location":
            self.conv = nn.Conv(self.conv_out_channels,
                                (self.conv_kernel_size,), padding="SAME",
                                use_bias=False, param_dtype=self.param_dtype)
            self.w_conv = nn.Dense(self.adim, use_bias=False,
                                   param_dtype=self.param_dtype)
        if a == "dot":
            self.w_key = nn.Dense(self.adim, use_bias=False,
                                  param_dtype=self.param_dtype)
            self.w_query = nn.Dense(self.adim, use_bias=False,
                                    param_dtype=self.param_dtype)
        if a == "luong_general":
            self.w_key = nn.Dense(self.qdim, use_bias=False,
                                  param_dtype=self.param_dtype)
        if a == "luong_concat":
            self.w_cat = nn.Dense(self.adim, use_bias=False,
                                  param_dtype=self.param_dtype)
            self.v = nn.Dense(1, use_bias=False, param_dtype=self.param_dtype)
        self.drop = Dropout(self.dropout)

    def precompute(self, key: jnp.ndarray) -> jnp.ndarray:
        """Project keys once per utterance: [B, Tk, kdim] -> key_cache."""
        if self.atype in ("location", "add", "dot", "luong_general"):
            return self.w_key(key)
        return key

    def __call__(self, key, value, query, mask=None, aw_prev=None,
                 trigger_points=None, key_cache=None,
                 deterministic: bool = True):
        """key: raw keys [B, Tk, kdim] (used if ``key_cache`` not given);
        key_cache: output of ``precompute(key)``; query: [B, qdim];
        aw_prev: [B, Tk]. Returns (context [B, vdim], aw [B, Tk])."""
        if key_cache is None:
            key_cache = self.precompute(key)
        bs, tk = key_cache.shape[:2]
        if self.atype == "no":
            if mask is None:
                aw = jnp.full((bs, tk), 1.0 / tk, key_cache.dtype)
            else:
                m = mask.astype(key_cache.dtype)
                aw = m / jnp.maximum(m.sum(-1, keepdims=True), 1.0)
            return jnp.einsum("bk,bkd->bd", aw, value), aw

        if self.atype == "location":
            q = self.w_query(query)
            f = self.w_conv(self.conv(aw_prev[..., None]))
            e = self.v(jnp.tanh(key_cache + q[:, None] + f))[..., 0]
        elif self.atype == "add":
            q = self.w_query(query)
            e = self.v(jnp.tanh(key_cache + q[:, None]))[..., 0]
        elif self.atype == "dot":
            # reference 'dot' is unscaled (attention.py:115)
            e = jnp.einsum("bd,bkd->bk", self.w_query(query), key_cache)
        elif self.atype in ("luong_dot", "luong_general"):
            e = jnp.einsum("bd,bkd->bk", query, key_cache)
        elif self.atype == "luong_concat":
            q = jnp.broadcast_to(query[:, None], (bs, tk, query.shape[-1]))
            e = self.v(jnp.tanh(self.w_cat(
                jnp.concatenate([key_cache, q], -1))))[..., 0]
        else:
            raise ValueError(self.atype)

        # triggered attention: restrict to frames <= per-utterance trigger
        if trigger_points is not None:
            t_idx = jnp.arange(tk)[None]
            trig_mask = t_idx <= trigger_points[:, None]
            mask = trig_mask if mask is None else (mask & trig_mask)
        if mask is not None:
            e = apply_mask_logits(e, mask)
        e32 = e.astype(jnp.float32)  # f32 normalisation under bf16 compute
        if self.sigmoid_smoothing:
            aw = jax.nn.sigmoid(e32)
            aw = aw / jnp.maximum(aw.sum(-1, keepdims=True), 1e-6)
        else:
            aw = jax.nn.softmax(self.sharpening_factor * e32, axis=-1)
        aw = aw.astype(e.dtype)
        aw = self.drop(aw, deterministic=deterministic)
        ctx = jnp.einsum("bk,bkd->bd", aw, value)
        return ctx, aw
