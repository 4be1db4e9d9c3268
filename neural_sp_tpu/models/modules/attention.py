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

    def _location_conv(self, aw_prev: jnp.ndarray) -> jnp.ndarray:
        """Location feature conv [B, Tk] -> [B, Tk, C], SAME padding.

        NOT ``nn.Conv``: on TPU a width-201 1-D conv inside the decoder
        scan measured ~9 ms/step-loop (tools/dec_ablate.py r3 — half the
        whole decoder cost). Expressed instead as one [B, S] @ [S, Tk*C]
        matmul against a Toeplitz expansion of the kernel; the expansion
        is built with a one-hot contraction (never a gather — TPU gathers
        serialise on the scalar unit) from the [K, C] weights and is
        loop-invariant, so XLA hoists it out of the scan. Same math, same
        parameters, MXU instead of the conv lowering."""
        import os
        bs, tk = aw_prev.shape
        k = self.conv_kernel_size
        if os.environ.get("NSP_LOC_CONV") == "xla" \
                or self.is_initializing():
            # escape hatch + init path: the nn.Conv call owns the kernel
            # params (path 'conv/kernel', shared with the matmul path)
            out = self.conv(aw_prev[..., None])
            if not self.is_initializing() or \
                    os.environ.get("NSP_LOC_CONV") == "xla":
                return out
        kernel = self.conv.variables["params"]["kernel"]   # [K, 1, C]
        # SAME padding for stride 1: left = (k-1)//2
        left = (k - 1) // 2
        s = tk + k - 1
        aw_pad = jnp.pad(aw_prev, ((0, 0), (left, k - 1 - left)))
        si = jax.lax.broadcasted_iota(jnp.int32, (s, tk), 0)
        ti = jax.lax.broadcasted_iota(jnp.int32, (s, tk), 1)
        idx = si - ti                                 # tap index in [0, k)
        oh = (idx[..., None] ==
              jnp.arange(k)[None, None]).astype(kernel.dtype)  # [S, Tk, K]
        toep = jnp.einsum("stj,jc->stc", oh, kernel[:, 0])     # [S, Tk, C]
        return jnp.einsum("bs,stc->btc", aw_pad,
                          toep.astype(aw_pad.dtype))

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
            f = self.w_conv(self._location_conv(aw_prev))
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


class MultiheadAddAttention(nn.Module):
    """Multi-head additive attention for the LAS decoder when
    ``attn_n_heads > 1`` (reference ``multihead_attention.py:30-157``,
    selected at ``las.py:220-226``; the reference asserts atype 'add').

    Energies share the full ``adim``-wide tanh features across heads —
    ``v`` maps adim -> n_heads (multihead_attention.py:61,135) — and the
    per-head contexts are value-head slices re-projected by ``w_out`` to
    ``odim`` (= enc units). Keys AND values are projected once per
    utterance via ``precompute``; the per-token step does only the query
    projection, the tanh energy, and two small contractions.
    """
    kdim: int
    qdim: int
    adim: int
    odim: int
    n_heads: int = 4
    dropout: float = 0.0
    external_kv: bool = False   # key/value projections owned by the caller
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.adim % self.n_heads == 0
        if not self.external_kv:
            self.w_key = nn.Dense(self.adim, param_dtype=self.param_dtype)
            self.w_value = nn.Dense(self.adim, param_dtype=self.param_dtype)
        self.w_query = nn.Dense(self.adim, param_dtype=self.param_dtype)
        self.v = nn.Dense(self.n_heads, param_dtype=self.param_dtype)
        self.w_out = nn.Dense(self.odim, param_dtype=self.param_dtype)
        self.drop = Dropout(self.dropout)

    def precompute(self, key: jnp.ndarray) -> dict:
        """[B, Tk, kdim] -> cached projected keys/values."""
        return {"k": self.w_key(key), "v": self.w_value(key)}

    def __call__(self, key, value, query, mask=None, aw_prev=None,
                 trigger_points=None, key_cache=None,
                 deterministic: bool = True):
        """query: [B, qdim]. Returns (ctx [B, odim], aw [B, Tk] head-mean
        — the LAS carry/plot protocol is single-map; per-head maps stay
        internal). ``aw_prev``/``trigger_points`` are interface dummies
        (reference forward: aw_prev dummy, multihead_attention.py:100)."""
        if key_cache is None:
            key_cache = self.precompute(key)
        k, val = key_cache["k"], key_cache["v"]
        bs, tk = k.shape[:2]
        dk = self.adim // self.n_heads
        q = self.w_query(query)                                 # [B, adim]
        e = self.v(jnp.tanh(k + q[:, None]))                    # [B, Tk, H]
        if mask is not None:
            e = apply_mask_logits(e, mask[..., None])
        aw = jax.nn.softmax(e.astype(jnp.float32), axis=1).astype(e.dtype)
        aw = self.drop(aw, deterministic=deterministic)         # [B, Tk, H]
        vh = val.reshape(bs, tk, self.n_heads, dk)
        ctx = jnp.einsum("bth,bthd->bhd", aw, vh).reshape(bs, self.adim)
        return self.w_out(ctx), jnp.mean(aw, axis=-1)
