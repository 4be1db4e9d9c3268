"""LSTM language model (reference ``neural_sp/models/lm/rnnlm.py:18-263``):
projections, residual connections, GLU head, tied embeddings; explicit
recurrent state I/O for BPTT streams and fusion/rescoring."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ..modules.recurrent import RNNLayer
from ..modules.glu import LinearGLUBlock
from ...ops.dropout import Dropout


class RNNLM(nn.Module):
    vocab: int
    n_units: int = 1024
    n_projs: int = 0
    n_layers: int = 2
    emb_dim: int = 1024
    residual: bool = False
    use_glu: bool = False
    adaptive_softmax: bool = False
    adaptive_softmax_cutoffs: tuple = (2000, 10000)
    tie_embedding: bool = False
    dropout: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0
    # simulate a null context vector concatenated to the embedding so the
    # LM matches a fusion decoder's input layout (reference rnnlm.py:56,
    # 187-188 --n_units_null_context)
    n_units_null_context: int = 0

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.emb_dim)
        self.rnns = [RNNLayer(self.n_units, "lstm", bidirectional=False)
                     for _ in range(self.n_layers)]
        if self.n_projs > 0:
            self.projs = [nn.Dense(self.n_projs)
                          for _ in range(self.n_layers)]
        if self.use_glu:
            self.glu = LinearGLUBlock(self._odim())
        if self.adaptive_softmax:
            self.asm = AdaptiveSoftmax(
                vocab=self.vocab, d_in=self._odim(),
                cutoffs=self.adaptive_softmax_cutoffs)
        elif self.tie_embedding:
            # reference rnnlm.py:78-84: a bridge projection when the
            # hidden dim differs from emb_dim, and the tied output layer
            # keeps its own free bias (nn.Linear default)
            self.output_proj = nn.Dense(self.emb_dim) \
                if self._odim() != self.emb_dim else None
            self.output_bias = self.param(
                "output_bias", nn.initializers.zeros, (self.vocab,))
        else:
            self.output = nn.Dense(self.vocab)
        self.drop = Dropout(self.dropout)
        self.drop_emb = Dropout(self.dropout_emb)

    def _odim(self):
        return self.n_projs if self.n_projs > 0 else self.n_units

    def decode(self, ys, state=None, deterministic: bool = True):
        """ys: [B, T] -> (hidden [B, T, D], new_state)."""
        h = self.drop_emb(self.embed(ys), deterministic=deterministic)
        if self.n_units_null_context > 0:
            h = jnp.concatenate(
                [h, jnp.zeros(h.shape[:-1] + (self.n_units_null_context,),
                              h.dtype)], axis=-1)
        new_state = []
        for lth in range(self.n_layers):
            residual = h
            c = state[lth] if state is not None else None
            h, nc = self.rnns[lth](h, None, c, deterministic)
            h = self.drop(h, deterministic=deterministic)
            if self.n_projs > 0:
                h = jnp.tanh(self.projs[lth](h))
            if self.residual and residual.shape[-1] == h.shape[-1] and lth > 0:
                h = h + residual
            new_state.append(nc)
        if self.use_glu:
            h = self.glu(h)
        return h, new_state

    def logits_from_hidden(self, h):
        if self.adaptive_softmax:
            return self.asm.log_probs(h)  # already log-probs
        if self.tie_embedding:
            if self.output_proj is not None:
                h = self.output_proj(h)
            return self.embed.attend(h) + self.output_bias
        return self.output(h)

    def __call__(self, ys_in, ys_out, state=None, deterministic: bool = True):
        """BPTT window loss. ys_in/ys_out: [B, T]."""
        h, new_state = self.decode(ys_in, state, deterministic)
        if self.adaptive_softmax:
            loss = self.asm.loss(h, ys_out, ignore_index=PAD)
            lp = self.asm.log_probs(h)
            acc = compute_accuracy(lp, ys_out, PAD)
            obs = {"loss": loss, "ppl": jnp.exp(loss), "acc": acc}
            return loss, new_state, obs
        logits = self.logits_from_hidden(h)
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD,
                                      normalize_length=True)
        acc = compute_accuracy(logits, ys_out, PAD)
        obs = {"loss": loss, "ppl": jnp.exp(nll), "acc": acc}
        return loss, new_state, obs

    def predict(self, y, state=None):
        """One-step for fusion/rescoring: y [B] -> (log_probs [B, V], state,
        hidden [B, D])."""
        h, new_state = self.decode(y[:, None], state, True)
        if self.adaptive_softmax:
            return (self.asm.log_probs(h[:, 0]), new_state, h[:, 0])
        logits = self.logits_from_hidden(h[:, 0])
        return nn.log_softmax(logits.astype(jnp.float32)), new_state, h[:, 0]


class AdaptiveSoftmax(nn.Module):
    """Cluster-factorised softmax (reference rnnlm adaptive_softmax option).

    Head = [frequent tokens | one slot per tail cluster]; each tail projects
    through a shrinking bottleneck (d / 4^i). On TPU the win is the
    parameter/memory reduction for large vocabs — cluster log-probs are
    computed for all positions with masking (static shapes) rather than
    index_select.
    """
    vocab: int
    d_in: int
    cutoffs: tuple = (2000, 10000)
    div_value: int = 4

    def setup(self):
        cuts = [c for c in self.cutoffs if c < self.vocab]
        self._cuts = tuple(cuts) + (self.vocab,)
        n_tails = len(self._cuts) - 1
        self.head = nn.Dense(self._cuts[0] + n_tails)
        tails = []
        for i in range(n_tails):
            d_tail = max(self.d_in // (self.div_value ** (i + 1)), 8)
            tails.append([nn.Dense(d_tail),
                          nn.Dense(self._cuts[i + 1] - self._cuts[i])])
        self.tails = tails

    def log_probs(self, h):
        """h: [..., d_in] -> full-vocab log-probs [..., vocab]."""
        head_lp = jax.nn.log_softmax(
            self.head(h).astype(jnp.float32), -1)
        parts = [head_lp[..., : self._cuts[0]]]
        for i, (proj, out) in enumerate(self.tails):
            tail_lp = jax.nn.log_softmax(
                out(proj(h)).astype(jnp.float32), -1)
            parts.append(head_lp[..., self._cuts[0] + i: self._cuts[0] + i + 1]
                         + tail_lp)
        return jnp.concatenate(parts, axis=-1)

    def loss(self, h, ys, ignore_index: int = 3):
        """Mean NLL over valid tokens (normalize_length convention)."""
        lp = self.log_probs(h)
        mask = ys != ignore_index
        tok = jnp.take_along_axis(
            lp, jnp.maximum(ys, 0)[..., None], axis=-1)[..., 0]
        n = jnp.maximum(jnp.sum(mask), 1)
        return -jnp.sum(jnp.where(mask, tok, 0.0)) / n
