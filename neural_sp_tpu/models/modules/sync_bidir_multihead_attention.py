"""Synchronous bidirectional multi-head attention.

Reference: ``neural_sp/models/modules/sync_bidir_multihead_attention.py``
(197 LoC): a shared-weight MHA applied twice per direction — each stream
attends its own history (causal ``tgt_mask``) and the OTHER direction's
states (``identity_mask``, typically blocking the same position) — and the
two context vectors merge as ``cv_history + future_weight * tanh(cv_future)``.
Used for L2R+R2L simultaneous decoding.

TPU-first: one einsum per energy, both directions batched through the same
projection parameters; no mutable key caches (keys are precomputed by the
caller and passed per call).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.masks import apply_mask_logits
from ...ops.dropout import Dropout


class SyncBidirMultiheadAttention(nn.Module):
    kdim: int
    qdim: int
    adim: int
    odim: int
    n_heads: int = 4
    dropout: float = 0.0
    future_weight: float = 0.1

    @nn.compact
    def __call__(self, key_fwd, value_fwd, query_fwd,
                 key_bwd, value_bwd, query_bwd,
                 tgt_mask=None, identity_mask=None,
                 deterministic: bool = True):
        """All inputs [B, len, dim]; masks [B, qlen, klen] (True = attend).

        Returns (cv_fwd, cv_bwd, aw_fwd_h, aw_fwd_f, aw_bwd_h, aw_bwd_f).
        """
        bs, klen, _ = key_fwd.shape
        qlen = query_fwd.shape[1]
        h, dk = self.n_heads, self.adim // self.n_heads
        w_key = nn.Dense(self.adim, name="w_key")
        w_value = nn.Dense(self.adim, name="w_value")
        w_query = nn.Dense(self.adim, name="w_query")
        w_out = nn.Dense(self.odim, name="w_out")
        drop = Dropout(self.dropout)

        def split(x, n):
            return x.reshape(bs, n, h, dk)

        kf = split(w_key(key_fwd), klen)
        kb = split(w_key(key_bwd), klen)
        vf = split(w_value(value_fwd), klen)
        vb = split(w_value(value_bwd), klen)
        qf = split(w_query(query_fwd), qlen)
        qb = split(w_query(query_bwd), qlen)
        scale = 1.0 / np.sqrt(dk)

        def attend(q, k, v, mask):
            e = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            if mask is not None:
                e = apply_mask_logits(e, mask[:, None])
            aw = jax.nn.softmax(e.astype(jnp.float32), -1).astype(q.dtype)
            aw = drop(aw, deterministic=deterministic)
            cv = jnp.einsum("bhqk,bkhd->bqhd", aw, v)
            return w_out(cv.reshape(bs, qlen, h * dk)), aw

        cv_fwd_h, aw_fwd_h = attend(qf, kf, vf, tgt_mask)
        cv_fwd_f, aw_fwd_f = attend(qf, kb, vb, identity_mask)
        cv_bwd_h, aw_bwd_h = attend(qb, kb, vb, tgt_mask)
        cv_bwd_f, aw_bwd_f = attend(qb, kf, vf, identity_mask)

        cv_fwd = cv_fwd_h + self.future_weight * jnp.tanh(cv_fwd_f)
        cv_bwd = cv_bwd_h + self.future_weight * jnp.tanh(cv_bwd_f)
        return cv_fwd, cv_bwd, aw_fwd_h, aw_fwd_f, aw_bwd_h, aw_bwd_f


class SyncBidirTransformerDecoderBlock(nn.Module):
    """Pre-norm decoder layer decoding L2R and R2L streams simultaneously
    (reference ``modules/transformer.py:271-400``): shared-weight
    sync-bidir self-attention over both streams, then encoder
    cross-attention and FFN applied to each stream with shared parameters.
    """
    d_model: int
    d_ff: int
    n_heads: int = 4
    dropout: float = 0.0
    dropout_att: float = 0.0
    future_weight: float = 0.1

    @nn.compact
    def __call__(self, ys, ys_bwd, yy_mask, identity_mask, xs, xy_mask=None,
                 deterministic: bool = True):
        """ys/ys_bwd: [B, L, D]; yy_mask causal [B, L, L]; identity_mask
        blocks same-position peeking between streams; xs: [B, T, D].

        Returns (ys, ys_bwd, aws dict)."""
        from .multihead_attention import MultiheadAttention
        from .feed_forward import FFN

        sync = SyncBidirMultiheadAttention(
            kdim=self.d_model, qdim=self.d_model, adim=self.d_model,
            odim=self.d_model, n_heads=self.n_heads,
            dropout=self.dropout_att, future_weight=self.future_weight,
            name="self_attn")
        norm1 = nn.LayerNorm(name="norm1")
        h_f, h_b = norm1(ys), norm1(ys_bwd)
        cv_f, cv_b, awfh, awff, awbh, awbf = sync(
            h_f, h_f, h_f, h_b, h_b, h_b, yy_mask, identity_mask,
            deterministic=deterministic)
        drop = Dropout(self.dropout)
        ys = ys + drop(cv_f, deterministic=deterministic)
        ys_bwd = ys_bwd + drop(cv_b, deterministic=deterministic)

        # shared-weight source attention + FFN on each stream
        src = MultiheadAttention(
            d_model=self.d_model, n_heads=self.n_heads,
            dropout=self.dropout_att, name="src_attn")
        norm2 = nn.LayerNorm(name="norm2")
        out_f, _, xy_f = src(norm2(ys), key=xs, value=xs, mask=xy_mask,
                             deterministic=deterministic,
                             return_weights=True)
        out_b, _, xy_b = src(norm2(ys_bwd), key=xs, value=xs, mask=xy_mask,
                             deterministic=deterministic,
                             return_weights=True)
        ys = ys + drop(out_f, deterministic=deterministic)
        ys_bwd = ys_bwd + drop(out_b, deterministic=deterministic)

        ffn = FFN(d_model=self.d_model, d_ff=self.d_ff,
                  dropout=self.dropout, name="feed_forward")
        norm3 = nn.LayerNorm(name="norm3")
        ys = ys + drop(ffn(norm3(ys), deterministic=deterministic),
                       deterministic=deterministic)
        ys_bwd = ys_bwd + drop(
            ffn(norm3(ys_bwd), deterministic=deterministic),
            deterministic=deterministic)
        return ys, ys_bwd, {"yy_fwd_h": awfh, "yy_fwd_f": awff,
                            "yy_bwd_h": awbh, "yy_bwd_f": awbf,
                            "xy_fwd": xy_f, "xy_bwd": xy_b}
