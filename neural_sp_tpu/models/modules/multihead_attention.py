"""Multi-head attention with functional KV caching + HeadDrop.

Reference: ``neural_sp/models/modules/multihead_attention.py:17-160``
(scaled-dot / additive energies, encoder-side KV pre-compute cache,
HeadDrop) — re-designed around explicit ``(out, cache)`` state instead of
mutable module attributes so the same module serves training, incremental
decoding, and batched beam search under jit.

Cache protocol (all arrays [B, T, H, d_k]):
  * ``cache=None``, ``key`` given            -> plain full attention
  * ``cache={"k","v"}``, ``key=None``        -> use cached cross-attn K/V
  * ``cache={"k","v"}``, ``key`` given       -> append (incremental self-attn)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.masks import apply_mask_logits
from ...ops.dropout import Dropout


def headdrop(aws: jnp.ndarray, rng, p: float) -> jnp.ndarray:
    """Drop whole heads' attention weights (reference headdrop.py:11-32).

    aws: [B, H, Tq, Tk]. Dropped heads get zero weight (no rescale, matching
    the reference's elementwise-dropout-of-heads behaviour).
    """
    keep = jax.random.bernoulli(rng, 1.0 - p, aws.shape[:2])
    return aws * keep[:, :, None, None].astype(aws.dtype)


class MultiheadAttention(nn.Module):
    d_model: int
    n_heads: int
    dropout: float = 0.0
    dropout_head: float = 0.0
    atype: str = "scaled_dot"   # scaled_dot | add
    d_kv: int = 0               # override per-head total kv dim (default d_model)
    bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key=None, value=None, mask=None, cache=None,
                 deterministic: bool = True, return_weights: bool = False):
        d_total = self.d_kv if self.d_kv > 0 else self.d_model
        h = self.n_heads
        dk = d_total // h
        bs, tq, _ = query.shape

        q = nn.Dense(d_total, use_bias=self.bias, name="w_query",
                     param_dtype=self.param_dtype)(query)
        q = q.reshape(bs, tq, h, dk)

        if key is not None:
            k = nn.Dense(d_total, use_bias=self.bias, name="w_key",
                         param_dtype=self.param_dtype)(key)
            v = nn.Dense(d_total, use_bias=self.bias, name="w_value",
                         param_dtype=self.param_dtype)(value if value is not None else key)
            k = k.reshape(bs, key.shape[1], h, dk)
            v = v.reshape(bs, key.shape[1], h, dk)
            if cache is not None:
                k = jnp.concatenate([cache["k"], k], axis=1)
                v = jnp.concatenate([cache["v"], v], axis=1)
        else:
            k, v = cache["k"], cache["v"]
        new_cache = {"k": k, "v": v}

        if self.atype == "scaled_dot":
            e = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(dk, q.dtype))
        elif self.atype == "add":
            w = self.param("w_add", nn.initializers.lecun_normal(),
                           (h, dk), self.param_dtype).astype(q.dtype)
            e = jnp.einsum(
                "hd,bhqkd->bhqk", w,
                jnp.tanh(q[:, :, None] + k[:, None]).transpose(0, 3, 1, 2, 4))
        else:
            raise ValueError(self.atype)

        if mask is not None:
            if mask.ndim == 2:       # [B, Tk]
                mask = mask[:, None, None, :]
            elif mask.ndim == 3:     # [B, Tq, Tk]
                mask = mask[:, None]
            e = apply_mask_logits(e, mask)
        aws = jax.nn.softmax(e.astype(jnp.float32), axis=-1).astype(q.dtype)
        if not deterministic and self.dropout_head > 0:
            aws = headdrop(aws, self.make_rng("dropout"), self.dropout_head)
        aws_d = Dropout(self.dropout)(aws, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", aws_d, v).reshape(bs, tq, d_total)
        out = nn.Dense(self.d_model, use_bias=self.bias, name="w_out",
                       param_dtype=self.param_dtype)(ctx)
        if return_weights:
            return out, new_cache, aws
        return out, new_cache, None
