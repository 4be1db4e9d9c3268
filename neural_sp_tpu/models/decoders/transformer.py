"""Transformer decoder (reference
``neural_sp/models/seq2seq/decoders/transformer.py:39-947`` and the block at
``neural_sp/models/modules/transformer.py:21-268``).

Pre-norm blocks: causal self-attn -> src-attn -> FFN. Training is one fully
parallel pass under a causal mask; incremental decoding keeps per-layer
self-attn KV caches ((params, cache) -> (out, cache), no module mutation).
MMA (monotonic multihead) source attention attaches in the streaming
milestone.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import EOS, PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ...ops.masks import make_pad_mask, causal_mask
from ..modules.multihead_attention import MultiheadAttention
from ..modules.feed_forward import FFN
from ..modules.positional_embedding import PositionalEncoding
from ..utils import append_sos_eos


class TransformerDecoderBlock(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    dropout_att: float = 0.0
    dropout_layer: float = 0.0
    ffn_activation: str = "relu"

    @nn.compact
    def __call__(self, ys, self_mask=None, eouts=None, src_mask=None,
                 self_cache=None, src_cache=None, deterministic: bool = True,
                 return_weights: bool = False):
        new_cache = {}
        h = nn.LayerNorm(name="norm_self")(ys)
        h, kv, _ = MultiheadAttention(
            d_model=self.d_model, n_heads=self.n_heads,
            dropout=self.dropout_att, name="self_attn")(
            h, h, h, self_mask, self_cache, deterministic)
        new_cache["self"] = kv
        ys = ys + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        aws = None
        if eouts is not None:
            h = nn.LayerNorm(name="norm_src")(ys)
            if src_cache is not None:
                h, _, aws = MultiheadAttention(
                    d_model=self.d_model, n_heads=self.n_heads,
                    dropout=self.dropout_att, name="src_attn")(
                    h, None, None, src_mask, src_cache, deterministic,
                    return_weights=return_weights)
                new_cache["src"] = src_cache
            else:
                h, src_kv, aws = MultiheadAttention(
                    d_model=self.d_model, n_heads=self.n_heads,
                    dropout=self.dropout_att, name="src_attn")(
                    h, eouts, eouts, src_mask, None, deterministic,
                    return_weights=return_weights)
                new_cache["src"] = src_kv
            ys = ys + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        h = nn.LayerNorm(name="norm_ff")(ys)
        h = FFN(self.d_model, self.d_ff, self.dropout, self.ffn_activation,
                name="ff")(h, deterministic)
        ys = ys + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return ys, new_cache, aws


class TransformerDecoder(nn.Module):
    vocab: int
    enc_n_units: int
    d_model: int = 256
    d_ff: int = 2048
    n_heads: int = 4
    n_layers: int = 6
    pe_type: str = "add"
    dropout: float = 0.1
    dropout_att: float = 0.0
    dropout_layer: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0
    ffn_activation: str = "relu"
    backward: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model)
        self.pos_enc = PositionalEncoding(self.d_model, self.pe_type,
                                          self.dropout_emb)
        self.blocks = [
            TransformerDecoderBlock(
                self.d_model, self.d_ff, self.n_heads, self.dropout,
                self.dropout_att, self.dropout_layer, self.ffn_activation)
            for _ in range(self.n_layers)]
        self.norm_out = nn.LayerNorm()
        self.bridge = nn.Dense(self.d_model) \
            if self.enc_n_units != self.d_model else None
        self.output = nn.Dense(self.vocab)

    def _bridge(self, eouts):
        return self.bridge(eouts) if self.bridge is not None else eouts

    def __call__(self, eouts, elens, ys, ylens, deterministic: bool = True,
                 return_logits: bool = False):
        bs, tmax, _ = eouts.shape
        ys_in, ys_out, _ = append_sos_eos(ys, ylens, bwd=self.backward)
        u1 = ys_in.shape[1]
        eouts = self._bridge(eouts)
        src_mask = make_pad_mask(elens, tmax)[:, None, :]  # [B, 1, Tk]
        tgt_mask = causal_mask(u1, u1)[None]
        h = self.pos_enc(self.embed(ys_in), 0, deterministic)
        for blk in self.blocks:
            h, _, aws = blk(h, tgt_mask, eouts, src_mask,
                            deterministic=deterministic,
                            return_weights=return_logits)
        logits = self.output(self.norm_out(h))
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD)
        acc = compute_accuracy(logits, ys_out, ignore_index=PAD)
        obs = {"loss_att": loss, "acc_att": acc, "ppl_att": jnp.exp(nll)}
        if return_logits:
            obs["logits"] = logits
            obs["aws"] = aws
        return loss, obs

    def sequence_log_prob(self, eouts, elens, ys, ylens):
        """Teacher-forced sum log-prob per utterance [B]."""
        bs, tmax, _ = eouts.shape
        ys_in, ys_out, _ = append_sos_eos(ys, ylens, bwd=self.backward)
        u1 = ys_in.shape[1]
        eouts = self._bridge(eouts)
        src_mask = make_pad_mask(elens, tmax)[:, None, :]
        tgt_mask = causal_mask(u1, u1)[None]
        h = self.pos_enc(self.embed(ys_in), 0, True)
        for blk in self.blocks:
            h, _, _ = blk(h, tgt_mask, eouts, src_mask)
        lp = jax.nn.log_softmax(
            self.output(self.norm_out(h)).astype(jnp.float32), -1)
        tok_lp = jnp.take_along_axis(
            lp, jnp.maximum(ys_out, 0)[..., None], axis=-1)[..., 0]
        valid = (ys_out != PAD)
        return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)

    # ---- incremental decoding ----
    def init_cache(self, bs: int, dtype=jnp.float32):
        dk = self.d_model // self.n_heads
        return [{"self": {"k": jnp.zeros((bs, 0, self.n_heads, dk), dtype),
                          "v": jnp.zeros((bs, 0, self.n_heads, dk), dtype)}}
                for _ in range(self.n_layers)]

    def precompute_src(self, eouts):
        """Per-layer cross-attn KV precompute for decoding."""
        eouts = self._bridge(eouts)
        caches = []
        for blk in self.blocks:
            # compute K/V through the block's src_attn projections
            _, cache, _ = blk(jnp.zeros(
                (eouts.shape[0], 1, self.d_model), eouts.dtype),
                None, eouts, None, None, None, True)
            caches.append(cache["src"])
        return caches

    def decode_step(self, caches, src_caches, y_t, src_mask, offset):
        """One token step. caches: list of {'self': kv}; y_t: [B].
        offset: static int position. Returns (new_caches, logits [B, V])."""
        h = self.pos_enc(self.embed(y_t[:, None]), offset, True)
        new_caches = []
        for blk, cache, src_kv in zip(self.blocks, caches, src_caches):
            h, nc, _ = blk(h, None, jnp.zeros(
                (h.shape[0], 1, self.d_model), h.dtype),
                src_mask, cache["self"], src_kv, True)
            new_caches.append({"self": nc["self"]})
        logits = self.output(self.norm_out(h))[:, 0]
        return new_caches, logits
