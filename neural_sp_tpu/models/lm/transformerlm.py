"""Decoder-only Transformer LM (reference
``neural_sp/models/lm/transformerlm.py:29-253``) with incremental per-layer
KV caches for fusion/rescoring."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ... import PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ...ops.masks import causal_mask
from ..modules.multihead_attention import MultiheadAttention
from ..modules.feed_forward import FFN
from ..modules.positional_embedding import PositionalEncoding
from ...ops.dropout import Dropout


class TransformerLMBlock(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    dropout_att: float = 0.0
    ffn_activation: str = "relu"

    @nn.compact
    def __call__(self, ys, mask=None, cache=None, deterministic: bool = True):
        h = nn.LayerNorm(name="norm_self")(ys)
        h, kv, _ = MultiheadAttention(
            d_model=self.d_model, n_heads=self.n_heads,
            dropout=self.dropout_att, name="self_attn")(
            h, h, h, mask, cache, deterministic)
        ys = ys + Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(name="norm_ff")(ys)
        h = FFN(self.d_model, self.d_ff, self.dropout, self.ffn_activation,
                name="ff")(h, deterministic)
        ys = ys + Dropout(self.dropout)(h, deterministic=deterministic)
        return ys, kv


class TransformerLM(nn.Module):
    vocab: int
    d_model: int = 512
    d_ff: int = 2048
    n_heads: int = 8
    n_layers: int = 6
    pe_type: str = "add"
    dropout: float = 0.1
    dropout_att: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0
    tie_embedding: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model)
        self.pos_enc = PositionalEncoding(self.d_model, self.pe_type,
                                          self.dropout_emb)
        self.blocks = [TransformerLMBlock(self.d_model, self.d_ff,
                                          self.n_heads, self.dropout,
                                          self.dropout_att)
                       for _ in range(self.n_layers)]
        self.norm_out = nn.LayerNorm()
        if not self.tie_embedding:
            self.output = nn.Dense(self.vocab)

    def _logits(self, h):
        h = self.norm_out(h)
        if self.tie_embedding:
            return self.embed.attend(h)
        return self.output(h)

    def decode(self, ys, caches=None, offset: int = 0,
               deterministic: bool = True):
        """ys: [B, T]; caches: per-layer {'k','v'} or None.
        Returns (hidden, new_caches)."""
        t = ys.shape[1]
        h = self.pos_enc(self.embed(ys), offset, deterministic)
        klen = t + (caches[0]["k"].shape[1] if caches is not None else 0)
        mask = causal_mask(t, klen, offset=klen - t)[None]
        new_caches = []
        for lth, blk in enumerate(self.blocks):
            c = caches[lth] if caches is not None else None
            h, kv = blk(h, mask, c, deterministic)
            new_caches.append(kv)
        return h, new_caches

    def __call__(self, ys_in, ys_out, state=None, deterministic: bool = True):
        h, _ = self.decode(ys_in, None, 0, deterministic)
        logits = self._logits(h)
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD,
                                      normalize_length=True)
        acc = compute_accuracy(logits, ys_out, PAD)
        return loss, None, {"loss": loss, "ppl": jnp.exp(nll), "acc": acc}

    def init_cache(self, bs: int, dtype=jnp.float32):
        dk = self.d_model // self.n_heads
        return [{"k": jnp.zeros((bs, 0, self.n_heads, dk), dtype),
                 "v": jnp.zeros((bs, 0, self.n_heads, dk), dtype)}
                for _ in range(self.n_layers)]

    def predict(self, y, state):
        """y: [B]; state: (caches, offset is implied by cache len)."""
        caches = state
        offset = caches[0]["k"].shape[1] if caches is not None else 0
        h, new_caches = self.decode(y[:, None], caches, offset, True)
        logits = self._logits(h[:, 0])
        return nn.log_softmax(logits.astype(jnp.float32)), new_caches, h[:, 0]
