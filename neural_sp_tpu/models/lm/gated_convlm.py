"""Gated convolutional LM (GCNN, reference
``neural_sp/models/lm/gated_convlm.py:17-234``): causal ConvGLU stack with
residuals; incremental predict keeps per-layer (k-1)-frame input caches."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ...ops.dropout import Dropout


class CausalConvGLU(nn.Module):
    channels: int
    kernel_size: int
    bottleneck_dim: int = 0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, xs, cache=None, deterministic: bool = True):
        """xs: [B, T, C]; cache: [B, k-1, C] previous inputs.
        Returns (out, new_cache)."""
        residual = xs
        k = self.kernel_size
        h = xs
        if self.bottleneck_dim > 0:
            h = nn.Dense(self.bottleneck_dim, name="bn_in")(h)
        if cache is not None:
            h_in = jnp.concatenate([cache, h], axis=1)
            pad = 0
        else:
            h_in = h
            pad = k - 1
        new_cache = h_in[:, -(k - 1):] if k > 1 else None
        out_ch = self.bottleneck_dim or self.channels
        c = nn.Conv(2 * out_ch, (k,), padding=[(pad, 0)], name="conv")(h_in)
        if cache is not None:
            c = c[:, -(xs.shape[1]):]
        a, b = jnp.split(c, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        if self.bottleneck_dim > 0:
            h = nn.Dense(self.channels, name="bn_out")(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        if residual.shape[-1] == h.shape[-1]:
            h = (h + residual) * jnp.sqrt(0.5).astype(h.dtype)
        return h, new_cache


class GatedConvLM(nn.Module):
    """layers spec like the encoder: 'channels:kernel' tokens, e.g. a
    GCNN-14-ish "850:6_850:6_850:6_850:6"."""
    vocab: int
    emb_dim: int = 280
    layers: str = "850:6_850:6_850:6"
    dropout: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0
    tie_embedding: bool = False

    @property
    def _specs(self):
        """'channels:kernel[:bottleneck]' tokens."""
        out = []
        for tok in self.layers.split("_"):
            parts = tok.split(":")
            out.append((int(parts[0]), int(parts[1]),
                        int(parts[2]) if len(parts) > 2 else 0))
        return out

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.emb_dim)
        blocks, resizes = [], []
        in_ch = self.emb_dim
        for ch, k, bn in self._specs:
            resizes.append(nn.Dense(ch) if in_ch != ch else None)
            blocks.append(CausalConvGLU(ch, k, bottleneck_dim=bn,
                                        dropout=self.dropout))
            in_ch = ch
        self.blocks = blocks
        self.resizes = resizes
        self.output = nn.Dense(self.vocab)
        self.drop_emb = Dropout(self.dropout_emb)

    def decode(self, ys, caches=None, deterministic: bool = True):
        h = self.drop_emb(self.embed(ys), deterministic=deterministic)
        new_caches = []
        for lth, blk in enumerate(self.blocks):
            if self.resizes[lth] is not None:
                h = self.resizes[lth](h)
            c = caches[lth] if caches is not None else None
            h, nc = blk(h, c, deterministic)
            new_caches.append(nc)
        return h, new_caches

    def __call__(self, ys_in, ys_out, state=None, deterministic: bool = True):
        h, _ = self.decode(ys_in, None, deterministic)
        logits = self.output(h)
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD,
                                      normalize_length=True)
        acc = compute_accuracy(logits, ys_out, PAD)
        return loss, None, {"loss": loss, "ppl": jnp.exp(nll), "acc": acc}

    def init_cache(self, bs: int, dtype=jnp.float32):
        caches = []
        for ch, k, bn in self._specs:
            # the block caches its post-bottleneck input (bn_in output)
            caches.append(jnp.zeros((bs, k - 1, bn or ch), dtype))
        return caches

    def predict(self, y, state):
        caches = state if state is not None else self.init_cache(y.shape[0])
        h, new_caches = self.decode(y[:, None], caches, True)
        logits = self.output(h[:, 0])
        return nn.log_softmax(logits.astype(jnp.float32)), new_caches, h[:, 0]
