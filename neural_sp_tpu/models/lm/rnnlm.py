"""LSTM language model (reference ``neural_sp/models/lm/rnnlm.py:18-263``):
projections, residual connections, GLU head, tied embeddings; explicit
recurrent state I/O for BPTT streams and fusion/rescoring."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ... import PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ..modules.recurrent import RNNLayer
from ..modules.glu import LinearGLUBlock


class RNNLM(nn.Module):
    vocab: int
    n_units: int = 1024
    n_projs: int = 0
    n_layers: int = 2
    emb_dim: int = 1024
    residual: bool = False
    use_glu: bool = False
    tie_embedding: bool = False
    dropout: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.emb_dim)
        self.rnns = [RNNLayer(self.n_units, "lstm", bidirectional=False)
                     for _ in range(self.n_layers)]
        if self.n_projs > 0:
            self.projs = [nn.Dense(self.n_projs)
                          for _ in range(self.n_layers)]
        if self.use_glu:
            self.glu = LinearGLUBlock(self._odim())
        if not self.tie_embedding:
            self.output = nn.Dense(self.vocab)
        self.drop = nn.Dropout(self.dropout)
        self.drop_emb = nn.Dropout(self.dropout_emb)

    def _odim(self):
        return self.n_projs if self.n_projs > 0 else self.n_units

    def decode(self, ys, state=None, deterministic: bool = True):
        """ys: [B, T] -> (hidden [B, T, D], new_state)."""
        h = self.drop_emb(self.embed(ys), deterministic=deterministic)
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
        if self.tie_embedding:
            assert self.emb_dim == self._odim(), \
                "tie_embedding requires emb_dim == output dim"
            return self.embed.attend(h)
        return self.output(h)

    def __call__(self, ys_in, ys_out, state=None, deterministic: bool = True):
        """BPTT window loss. ys_in/ys_out: [B, T]."""
        h, new_state = self.decode(ys_in, state, deterministic)
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
        logits = self.logits_from_hidden(h[:, 0])
        return nn.log_softmax(logits.astype(jnp.float32)), new_state, h[:, 0]
