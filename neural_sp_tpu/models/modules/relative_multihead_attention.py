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
                 deterministic: bool = True, return_weights: bool = False,
                 klens=None):
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

        use_pallas = (
            self._use_pallas(cache, deterministic, return_weights)
            and klens is not None and 0 < self.clamp_len < klen - 1
            and tq == klen)
        use_flash = (not use_pallas
                     and self._use_flash(cache, deterministic,
                                         return_weights))
        if not (use_flash or use_pallas):
            # content term ([B,H,T,T] — the fused kernels compute q.k
            # in-VMEM instead, so skip materializing it there)
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
            if use_pallas:
                # fused VMEM-resident kernel: scores + Toeplitz rel-bias +
                # f32 softmax + context never touch HBM (see
                # ops/rel_attention_pallas.py). The 1/sqrt(dk) scale folds
                # into q AND the bias table (both terms of e carry it).
                from ...ops.rel_attention_pallas import rel_attention
                scale = jnp.asarray(1.0 / np.sqrt(dk), q.dtype)
                o = rel_attention(
                    jnp.transpose(q_ac * scale, (0, 2, 1, 3)),
                    jnp.transpose(k, (0, 2, 1, 3)),
                    jnp.transpose(v, (0, 2, 1, 3)),
                    bd_all * scale.astype(bd_all.dtype),
                    klens)
                ctx = jnp.transpose(o, (0, 2, 1, 3)).reshape(
                    bs, tq, self.d_model)
                out = nn.Dense(self.d_model, use_bias=self.bias,
                               name="w_out",
                               param_dtype=self.param_dtype)(ctx)
                return out, new_cache, None
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

        if use_flash:
            # Pallas flash attention: the [B,H,T,T] scores + f32 softmax
            # never hit HBM — the rel-PE term and the padding mask fold
            # into the additive bias `ab` (still materialized once, but
            # read-only; the f32 score/softmax round-trips disappear).
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            # e = (ac + bd)/sqrt(dk): BOTH terms carry the scale
            ab = bd.astype(jnp.float32) / float(np.sqrt(dk))
            if mask is not None:
                m = mask
                if m.ndim == 2:
                    m = m[:, None, None, :]
                elif m.ndim == 3:
                    m = m[:, None]
                ab = jnp.where(m, ab, -1e9)
            pad_t = (-tq) % 128
            # fold the 1/sqrt(dk) scale into q: the kernel's dab VJP is
            # scaled by sm_scale (measured), so pass sm_scale=1.0
            scale = jnp.asarray(1.0 / np.sqrt(dk), q_ac.dtype)
            qf = jnp.transpose(q_ac * scale, (0, 2, 1, 3))  # [B, H, T, dk]
            kf = jnp.transpose(k, (0, 2, 1, 3))
            vf = jnp.transpose(v, (0, 2, 1, 3))
            if pad_t:
                pt = ((0, 0), (0, 0), (0, pad_t), (0, 0))
                qf = jnp.pad(qf, pt)
                kf = jnp.pad(kf, pt)
                vf = jnp.pad(vf, pt)
                ab = jnp.pad(ab, ((0, 0), (0, 0), (0, pad_t), (0, pad_t)),
                             constant_values=-1e9)
            o = flash_attention(qf, kf, vf, ab=ab, sm_scale=1.0)
            ctx = jnp.transpose(o[:, :, :tq], (0, 2, 1, 3)).reshape(
                bs, tq, self.d_model)
            out = nn.Dense(self.d_model, use_bias=self.bias, name="w_out",
                           param_dtype=self.param_dtype)(ctx)
            return out, new_cache, None

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

    def _use_pallas(self, cache, deterministic: bool,
                    return_weights: bool) -> bool:
        """Fused rel-attention kernel gate (``NSP_PALLAS_ATTN=1``; or
        ``interpret`` for CPU tests): clamped self-attention without
        caches/weights, no attention-weight dropout/headdrop (flagship
        sets dropout_att 0)."""
        import os
        flag = os.environ.get("NSP_PALLAS_ATTN", "0")
        if flag == "0":
            return False
        if cache is not None or return_weights:
            return False
        if not deterministic and (self.dropout > 0 or self.dropout_head > 0):
            return False
        if flag == "interpret":
            return True
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _use_flash(self, cache, deterministic: bool,
                   return_weights: bool) -> bool:
        """Flash path (opt-in, ``NSP_FLASH=1``): self-attention without
        caches/weights on TPU, and only when no attention-weight
        dropout/headdrop would apply (the flagship conf sets dropout_att
        0.0). Opt-in because at the flagship's post-subsample lengths
        (T=375/188) the Pallas kernel MEASURES SLOWER than XLA's fused
        materialized path (+18 ms/step, tools/ab_flagship.py r3) — the
        rel-PE bias still materializes [B,H,T,T] f32 as the kernel's ``ab``
        input, and at short T the kernel overhead beats the saved softmax
        traffic. Revisit for long-sequence work (LM BPTT, unsubsampled
        encoders)."""
        import os
        if os.environ.get("NSP_FLASH") != "1":
            return False
        if cache is not None or return_weights:
            return False
        if not deterministic and (self.dropout > 0 or self.dropout_head > 0):
            return False
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
