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
from ...ops.dropout import Dropout


class TransformerDecoderBlock(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    dropout_att: float = 0.0
    dropout_layer: float = 0.0
    ffn_activation: str = "relu"
    # MMA (monotonic multihead) source attention — reference
    # transformer.py:164-179 (from mma_first_layer upward)
    src_atype: str = "mha"            # mha | mocha
    mocha_chunk_size: int = 1
    mocha_n_heads_mono: int = 1
    mocha_n_heads_chunk: int = 1
    mocha_eps_wait: int = -1
    # share CA heads among MA heads (reference transformer.py:252)
    mocha_share_ca: bool = False

    @nn.compact
    def __call__(self, ys, self_mask=None, eouts=None, src_mask=None,
                 self_cache=None, src_cache=None, deterministic: bool = True,
                 return_weights: bool = False, alpha_prev=None):
        from ..modules.mocha import MMAStep
        new_cache = {}
        h = nn.LayerNorm(name="norm_self")(ys)
        h, kv, _ = MultiheadAttention(
            d_model=self.d_model, n_heads=self.n_heads,
            dropout=self.dropout_att, name="self_attn")(
            h, h, h, self_mask, self_cache, deterministic)
        new_cache["self"] = kv
        ys = ys + Dropout(self.dropout)(h, deterministic=deterministic)

        aws = None
        if eouts is not None and self.src_atype == "mocha":
            # monotonic multihead source attention: scan the per-position
            # alpha recurrence over the output sequence
            h = nn.LayerNorm(name="norm_src")(ys)
            h_ma = self.mocha_n_heads_mono or self.n_heads
            h_ca = self.mocha_n_heads_chunk
            adim = self.d_model // (h_ma * h_ca)
            kc = {"mono": nn.Dense(adim * h_ma, use_bias=False,
                                   name="mma_key_mono")(eouts),
                  "value": nn.Dense(adim * h_ma * h_ca, use_bias=False,
                                    name="mma_key_value")(eouts)}
            if self.mocha_chunk_size != 1:
                h_ck = h_ca if self.mocha_share_ca else h_ma * h_ca
                kc["chunk"] = nn.Dense(adim * h_ck, use_bias=False,
                                       name="mma_key_chunk")(eouts)
            bs, tk = eouts.shape[:2]
            if alpha_prev is None:
                alpha_prev = jnp.zeros((bs, h_ma, tk),
                                       eouts.dtype).at[:, :, 0].set(1.0)
            scan_mma = nn.scan(
                MMAStep, variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=(1, nn.broadcast, nn.broadcast, nn.broadcast),
                out_axes=1)(
                kdim=self.d_model, qdim=self.d_model, adim=adim,
                chunk_size=self.mocha_chunk_size, n_heads_mono=h_ma,
                n_heads_chunk=h_ca, share_ca=self.mocha_share_ca,
                eps_wait=self.mocha_eps_wait, name="src_mma")
            pad_1d = src_mask[:, 0, :] if src_mask is not None else None
            alpha_new, (ctx, alphas) = scan_mma(
                alpha_prev, h, kc, pad_1d, deterministic)
            new_cache["alpha"] = alpha_new
            aws = alphas  # [B, U, H, T]
            ys = ys + Dropout(self.dropout)(ctx,
                                               deterministic=deterministic)
        elif eouts is not None:
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
            ys = ys + Dropout(self.dropout)(h, deterministic=deterministic)

        h = nn.LayerNorm(name="norm_ff")(ys)
        h = FFN(self.d_model, self.d_ff, self.dropout, self.ffn_activation,
                name="ff")(h, deterministic)
        ys = ys + Dropout(self.dropout)(h, deterministic=deterministic)
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
    # MMA: layers >= mma_first_layer use monotonic source attention
    # (reference transformer.py mma_first_layer; 0 = disabled)
    mma_first_layer: int = 0
    mocha_chunk_size: int = 1
    mocha_n_heads_mono: int = 1
    mocha_n_heads_chunk: int = 1
    mocha_eps_wait: int = -1
    mocha_share_ca: bool = False
    quantity_loss_weight: float = 0.0

    def _is_mma(self, lth: int) -> bool:
        return self.mma_first_layer > 0 and (lth + 1) >= self.mma_first_layer

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.d_model)
        self.pos_enc = PositionalEncoding(self.d_model, self.pe_type,
                                          self.dropout_emb)
        self.blocks = [
            TransformerDecoderBlock(
                self.d_model, self.d_ff, self.n_heads, self.dropout,
                self.dropout_att, self.dropout_layer, self.ffn_activation,
                src_atype="mocha" if self._is_mma(lth) else "mha",
                mocha_chunk_size=self.mocha_chunk_size,
                mocha_n_heads_mono=self.mocha_n_heads_mono,
                mocha_n_heads_chunk=self.mocha_n_heads_chunk,
                mocha_share_ca=self.mocha_share_ca,
                mocha_eps_wait=self.mocha_eps_wait)
            for lth in range(self.n_layers)]
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
        mma_alphas = []
        for lth, blk in enumerate(self.blocks):
            h, _, aws = blk(h, tgt_mask, eouts, src_mask,
                            deterministic=deterministic,
                            return_weights=return_logits)
            if self._is_mma(lth) and aws is not None:
                mma_alphas.append(aws)  # [B, U, H, T]
        logits = self.output(self.norm_out(h))
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD)
        acc = compute_accuracy(logits, ys_out, ignore_index=PAD)
        obs = {"loss_att": loss, "acc_att": acc, "ppl_att": jnp.exp(nll)}
        if mma_alphas and self.quantity_loss_weight > 0 and not deterministic:
            # |sum alignment mass - #tokens| averaged over MMA layers/heads
            # (reference transformer.py:444-453)
            valid = (jnp.arange(u1)[None] < (ylens + 1)[:, None]
                     ).astype(jnp.float32)
            qty = jnp.zeros((bs,), jnp.float32)
            for a in mma_alphas:
                mass = jnp.sum(a.astype(jnp.float32), axis=(2, 3)) / a.shape[2]
                qty += jnp.abs(jnp.sum(mass * valid, axis=1)
                               - (ylens + 1).astype(jnp.float32))
            loss_qty = jnp.mean(qty) / len(mma_alphas)
            loss = loss + self.quantity_loss_weight * loss_qty
            obs["loss_quantity"] = loss_qty
            obs["loss_att"] = loss
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
    def init_cache(self, bs: int, dtype=jnp.float32, tmax: int = 0):
        dk = self.d_model // self.n_heads
        caches = []
        for lth in range(self.n_layers):
            c = {"self": {"k": jnp.zeros((bs, 0, self.n_heads, dk), dtype),
                          "v": jnp.zeros((bs, 0, self.n_heads, dk), dtype)}}
            if self._is_mma(lth):
                h_ma = self.mocha_n_heads_mono or self.n_heads
                c["alpha"] = jnp.zeros((bs, h_ma, tmax),
                                       dtype).at[:, :, 0].set(1.0)
            caches.append(c)
        return caches

    def precompute_src(self, eouts):
        """Per-layer cross-attn KV precompute for decoding (None for MMA
        layers, which take raw eouts per step)."""
        eouts = self._bridge(eouts)
        caches = []
        for lth, blk in enumerate(self.blocks):
            if self._is_mma(lth):
                caches.append({"k": eouts[:, :0], "v": eouts[:, :0]})
                continue
            # compute K/V through the block's src_attn projections
            _, cache, _ = blk(jnp.zeros(
                (eouts.shape[0], 1, self.d_model), eouts.dtype),
                None, eouts, None, None, None, True)
            caches.append(cache["src"])
        return caches

    def decode_step(self, caches, src_caches, y_t, src_mask, offset,
                    eouts=None):
        """One token step. caches: list of {'self': kv [, 'alpha']};
        y_t: [B]; offset: static int position; eouts: required when MMA
        layers are present. Returns (new_caches, logits [B, V])."""
        h = self.pos_enc(self.embed(y_t[:, None]), offset, True)
        if eouts is not None:
            eouts = self._bridge(eouts)
        new_caches = []
        for lth, (blk, cache, src_kv) in enumerate(
                zip(self.blocks, caches, src_caches)):
            if self._is_mma(lth):
                h, nc, _ = blk(h, None, eouts, src_mask,
                               cache["self"], None, True,
                               alpha_prev=cache["alpha"])
                new_caches.append({"self": nc["self"],
                                   "alpha": nc["alpha"]})
            else:
                h, nc, _ = blk(h, None, jnp.zeros(
                    (h.shape[0], 1, self.d_model), h.dtype),
                    src_mask, cache["self"], src_kv, True)
                new_caches.append({"self": nc["self"]})
        logits = self.output(self.norm_out(h))[:, 0]
        return new_caches, logits
