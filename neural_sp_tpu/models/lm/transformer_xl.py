"""Transformer-XL LM (reference ``neural_sp/models/lm/transformer_xl.py:30-308``):
relative PE with global u/v biases and segment-level memory.

Memory protocol (reference update_memory :156-188): per-layer memories hold
the last ``mem_len`` *input* hidden states of each block, stop-gradient'ed;
incremental decode (:205-272) is the same path with 1-token segments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ...ops.masks import causal_mask
from ..modules.relative_multihead_attention import RelativeMultiheadAttention
from ..modules.feed_forward import FFN
from ...ops.dropout import Dropout


class XLBlock(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    dropout_att: float = 0.0
    clamp_len: int = -1

    @nn.compact
    def __call__(self, h, mem=None, mask=None, deterministic: bool = True):
        # pre-norm over [mem; h] with one shared norm so memory keys match
        if mem is not None and mem.shape[1] > 0:
            cat = jnp.concatenate([mem, h], axis=1)
        else:
            cat = h
        key = nn.LayerNorm(name="norm_self")(cat)
        x = key[:, -h.shape[1]:]
        a, _, _ = RelativeMultiheadAttention(
            d_model=self.d_model, n_heads=self.n_heads,
            dropout=self.dropout_att, clamp_len=self.clamp_len,
            name="self_attn")(x, key=key, mask=mask,
                              deterministic=deterministic)
        h = h + Dropout(self.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(name="norm_ff")(h)
        x = FFN(self.d_model, self.d_ff, self.dropout, name="ff")(
            x, deterministic)
        return h + Dropout(self.dropout)(x, deterministic=deterministic)


class TransformerXL(nn.Module):
    vocab: int
    d_model: int = 512
    d_ff: int = 2048
    n_heads: int = 8
    n_layers: int = 6
    mem_len: int = 128
    clamp_len: int = -1
    dropout: float = 0.1
    dropout_att: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0
    tie_embedding: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model)
        self.blocks = [XLBlock(self.d_model, self.d_ff, self.n_heads,
                               self.dropout, self.dropout_att,
                               self.clamp_len)
                       for _ in range(self.n_layers)]
        self.norm_out = nn.LayerNorm()
        if not self.tie_embedding:
            self.output = nn.Dense(self.vocab)
        self.drop_emb = Dropout(self.dropout_emb)

    def init_mems(self, bs: int, dtype=jnp.float32):
        return [jnp.zeros((bs, 0, self.d_model), dtype)
                for _ in range(self.n_layers + 1)]

    def _logits(self, h):
        h = self.norm_out(h)
        if self.tie_embedding:
            return self.embed.attend(h)
        return self.output(h)

    def decode(self, ys, mems=None, deterministic: bool = True):
        """ys: [B, T]; mems: per-layer [B, M, D] (layer inputs).
        Returns (hidden [B, T, D], new_mems)."""
        bs, t = ys.shape
        h = self.drop_emb(
            self.embed(ys) * jnp.sqrt(jnp.asarray(self.d_model, jnp.float32)),
            deterministic=deterministic)
        if mems is None:
            mems = self.init_mems(bs, h.dtype)
        mlen = mems[0].shape[1]
        mask = causal_mask(t, t + mlen, offset=mlen)[None]
        new_mems = []
        for lth, blk in enumerate(self.blocks):
            new_mems.append(jax.lax.stop_gradient(
                jnp.concatenate([mems[lth], h], axis=1)[:, -self.mem_len:]))
            h = blk(h, mems[lth], mask, deterministic)
        new_mems.append(jax.lax.stop_gradient(
            jnp.concatenate([mems[-1], h], axis=1)[:, -self.mem_len:]))
        return h, new_mems

    def __call__(self, ys_in, ys_out, state=None, deterministic: bool = True):
        h, new_mems = self.decode(ys_in, state, deterministic)
        logits = self._logits(h)
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD,
                                      normalize_length=True)
        acc = compute_accuracy(logits, ys_out, PAD)
        return loss, new_mems, {"loss": loss, "ppl": jnp.exp(nll), "acc": acc}

    def predict(self, y, state):
        h, new_mems = self.decode(y[:, None], state, True)
        logits = self._logits(h[:, 0])
        return nn.log_softmax(logits.astype(jnp.float32)), new_mems, h[:, 0]
