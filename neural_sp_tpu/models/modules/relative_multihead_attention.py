"""Transformer-XL style relative-position multi-head attention.

Reference: ``neural_sp/models/modules/relative_multihead_attention.py:21-220``
(global u/v biases, clamp_len, streaming qlen != klen handling).

TPU-first redesign: instead of the pad/reshape ``_rel_shift`` trick (which
only covers the causal qlen==klen case cleanly), the relative term is
computed against a distance table and aligned gather-free — one code path
for bidirectional encoders, causal decoders, and streaming queries with
cache offsets, all static-shape under jit.

Numerical parity with the reference: the distance embedding is the
XL-sinusoid of ``-(|q - k| + 1)`` (``XLPositionalEmbedding`` feeds
``pos_idxs = -1..-L`` and ``_rel_shift`` indexes it by ABSOLUTE clamped
distance — positional_embedding.py:135-138, relative_multihead_attention.py
:125-145), with the XL concatenated [sin | cos] layout. ``xl_like=False``
(pe_type 'relative', the flagship conformer) projects positions through
``w_value`` and uses NO u/v biases; ``xl_like=True`` ('relative_xl') uses a
separate ``w_pos`` plus the global u/v biases (forward :174-199).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from ...ops.masks import apply_mask_logits
from .multihead_attention import headdrop
from ...ops.dropout import Dropout


def _signed_rel_table(klen: int, d_model: int, clamp_len: int) -> np.ndarray:
    """[2K-1, d_model] XL-sinusoid embeddings indexed by SIGNED distance
    -(K-1)..K-1; entry value depends on the ABSOLUTE distance (reference
    ``_rel_shift`` gathers ``pos_embs[|q-k|]`` where pos_embs[j] is the
    sinusoid of -(j+1))."""
    dist = np.arange(-(klen - 1), klen, dtype=np.float32)
    if clamp_len > 0:
        dist = np.clip(dist, -clamp_len, clamp_len)
    pos = -(np.abs(dist) + 1.0)
    inv = np.exp(np.arange(0, d_model, 2, np.float32)
                 * -(np.log(10000.0) / d_model))
    ang = pos[:, None] * inv
    return np.concatenate([np.sin(ang), np.cos(ang)],
                          axis=-1).astype(np.float32)


class RelativeMultiheadAttention(nn.Module):
    d_model: int
    n_heads: int
    dropout: float = 0.0
    dropout_head: float = 0.0
    clamp_len: int = -1
    bias: bool = True
    xl_like: bool = True   # True: w_pos + u/v biases ('relative_xl');
    #                        False: pos via w_value, no biases ('relative')
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key=None, value=None, mask=None, cache=None,
                 deterministic: bool = True, return_weights: bool = False):
        h = self.n_heads
        dk = self.d_model // h
        bs, tq, _ = query.shape

        w_value = nn.Dense(self.d_model, use_bias=self.bias, name="w_value",
                           param_dtype=self.param_dtype)
        q = nn.Dense(self.d_model, use_bias=self.bias, name="w_query",
                     param_dtype=self.param_dtype)(query).reshape(bs, tq, h, dk)
        k_in = key if key is not None else query
        k = nn.Dense(self.d_model, use_bias=self.bias, name="w_key",
                     param_dtype=self.param_dtype)(k_in)
        v = w_value(k_in)
        k = k.reshape(bs, k_in.shape[1], h, dk)
        v = v.reshape(bs, k_in.shape[1], h, dk)
        if cache is not None:
            k = jnp.concatenate([cache["k"], k], axis=1)
            v = jnp.concatenate([cache["v"], v], axis=1)
        new_cache = {"k": k, "v": v}
        klen = k.shape[1]

        if self.xl_like:
            u_bias = self.param("u_bias", nn.initializers.zeros, (h, dk),
                                self.param_dtype).astype(q.dtype)
            v_bias = self.param("v_bias", nn.initializers.zeros, (h, dk),
                                self.param_dtype).astype(q.dtype)
            q_ac = q + u_bias[None, None]
            q_bd = q + v_bias[None, None]
            w_rel = nn.Dense(self.d_model, use_bias=False, name="w_pos",
                             param_dtype=self.param_dtype)
        else:
            # reference 'relative': no biases; positions share w_value
            # (relative_multihead_attention.py:177-179)
            q_ac = q
            q_bd = q
            w_rel = w_value

        # content term ([B,H,T,T]). Two fused Pallas alternatives (a flash
        # kernel and a VMEM-resident rel-attention kernel) were built,
        # A/B-measured on chip, and DELETED: the flash path lost at every
        # length (flagship T=375/188: +18 ms/step r3; unsubsampled T=1024/
        # 2048/3072: 0.51-0.59x of XLA's fused materialized path, r5
        # tools/ab_longT.py) because the rel-PE bias still materializes
        # [B,H,T,T] f32 as the kernel's `ab` input; the rel-attention
        # kernel was throughput-neutral at flagship lengths and failed to
        # compile at T>=1024. See ROADMAP r5.
        ac = jnp.einsum("bqhd,bkhd->bhqk", q_ac, k)

        # position term. NEVER a gather here: TPU gathers (and the scatter
        # in their transpose) run on the scalar unit and serialise the
        # whole layer — measured 30x whole-encoder slowdown. Two gather-free
        # alignments:
        #   * clamp_len > 0 (the flagship uses 10): distances live in a
        #     (2c+1)-entry table; align with a small one-hot MXU matmul;
        #   * unclamped: full (2K-1)-entry table; the one-hot would blow up
        #     compile-time constant folding ([Q,K,2K-1]), so use the classic
        #     pad-flatten-reshape SKEW (pure reshapes/slices).
        if 0 < self.clamp_len < klen - 1:
            c = self.clamp_len
            # |distance| clamped to c: only c+1 distinct embeddings
            rel = jnp.asarray(
                _signed_rel_table(c + 1, self.d_model, c)[c:], q.dtype)
            r = w_rel(rel).reshape(c + 1, h, dk)       # [c+1, H, dk]
            bd_all = jnp.einsum("bqhd,rhd->bhqr", q_bd, r)
            qi = lax.broadcasted_iota(jnp.int32, (tq, klen), 0) + (klen - tq)
            kj = lax.broadcasted_iota(jnp.int32, (tq, klen), 1)
            idx = jnp.minimum(jnp.abs(qi - kj), c)
            onehot = jax.nn.one_hot(idx, c + 1, dtype=q.dtype)
            bd = jnp.einsum("bhqr,qkr->bhqk", bd_all, onehot)
        else:
            rel = jnp.asarray(
                _signed_rel_table(klen, self.d_model, self.clamp_len),
                q.dtype)
            nrel = 2 * klen - 1
            r = w_rel(rel).reshape(nrel, h, dk)
            bd_all = jnp.einsum("bqhd,rhd->bhqr", q_bd, r)
            # bd[b,h,q,j] = bd_all[b,h,q, (q + off - j) + (K-1)],
            # off = klen - tq: flatten rows, pad one slot per row, re-chop
            # with row length R+1 — the diagonal alignment becomes a
            # contiguous slice + reverse.
            off = klen - tq
            flat = bd_all.reshape(bs, h, tq * nrel)
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, tq)))
            skew = flat.reshape(bs, h, tq, nrel + 1)
            bd = skew[..., off: off + klen][..., ::-1]

        e = (ac + bd) / jnp.sqrt(jnp.asarray(dk, q.dtype))
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[:, None, None, :]
            elif mask.ndim == 3:
                mask = mask[:, None]
            e = apply_mask_logits(e, mask)
        aws = jax.nn.softmax(e.astype(jnp.float32), axis=-1).astype(q.dtype)
        if not deterministic and self.dropout_head > 0:
            aws = headdrop(aws, self.make_rng("dropout"), self.dropout_head)
        aws_d = Dropout(self.dropout)(aws, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", aws_d, v).reshape(bs, tq, self.d_model)
        out = nn.Dense(self.d_model, use_bias=self.bias, name="w_out",
                       param_dtype=self.param_dtype)(ctx)
        if return_weights:
            return out, new_cache, aws
        return out, new_cache, None
