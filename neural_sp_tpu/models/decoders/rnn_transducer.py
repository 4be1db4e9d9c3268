"""RNN-Transducer decoder: prediction network + additive joint network.

Reference: ``neural_sp/models/seq2seq/decoders/rnn_transducer.py:32-819``
(joint :262-276, loss wiring :244-258 via warp_rnnt — replaced by the
TPU-native lattice scan in ``ops/rnnt.py``).

The prediction network consumes the previous non-blank label with EOS as the
start symbol (reference convention); the joint is
``out = W_o tanh(W_enc h_enc + W_pred h_pred)`` broadcast over (T, U+1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import BLANK, EOS, PAD
from ...ops.rnnt import rnnt_loss_from_logits
from ..modules.recurrent import RNNLayer
from ...ops.dropout import Dropout


class RNNTransducer(nn.Module):
    vocab: int
    enc_n_units: int
    n_units: int = 512
    n_projs: int = 0
    n_layers: int = 1
    emb_dim: int = 512
    joint_dim: int = 512
    rnn_type: str = "lstm"      # lstm | gru (prediction net)
    dropout: float = 0.0
    dropout_emb: float = 0.0
    lsm_prob: float = 0.0       # unused (parity: transducer has no lsm)
    backward: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.emb_dim)
        self.pred_rnns = [
            RNNLayer(self.n_units, self.rnn_type, bidirectional=False)
            for _ in range(self.n_layers)]
        if self.n_projs > 0:
            self.pred_projs = [nn.Dense(self.n_projs)
                               for _ in range(self.n_layers)]
        self.w_enc = nn.Dense(self.joint_dim, name="w_enc")
        self.w_pred = nn.Dense(self.joint_dim, use_bias=False, name="w_pred")
        self.output = nn.Dense(self.vocab, name="output")
        self.drop = Dropout(self.dropout)
        self.drop_emb = Dropout(self.dropout_emb)

    def pred_net(self, ys_in, carry=None, deterministic: bool = True):
        """ys_in: [B, U'] token ids -> ([B, U', d_pred], new_carry)."""
        h = self.drop_emb(self.embed(ys_in), deterministic=deterministic)
        new_carry = []
        for lth in range(self.n_layers):
            c = carry[lth] if carry is not None else None
            h, nc = self.pred_rnns[lth](h, None, c, deterministic)
            h = self.drop(h, deterministic=deterministic)
            if self.n_projs > 0:
                h = jnp.tanh(self.pred_projs[lth](h))
            new_carry.append(nc)
        return h, new_carry

    def joint(self, eouts, pred_out):
        """eouts: [B, T, De], pred_out: [B, U', Dp] -> [B, T, U', V]."""
        he = self.w_enc(eouts)[:, :, None, :]
        hp = self.w_pred(pred_out)[:, None, :, :]
        return self.output(jnp.tanh(he + hp))

    def joint_step(self, eout_t, pred_t):
        """eout_t: [B, De], pred_t: [B, Dp] -> [B, V] (decode hot path)."""
        return self.output(jnp.tanh(self.w_enc(eout_t) + self.w_pred(pred_t)))

    def __call__(self, eouts, elens, ys, ylens, deterministic: bool = True):
        """Transducer loss; ys: [B, U] PAD-padded."""
        bs, u = ys.shape
        ys_in = jnp.concatenate(
            [jnp.full((bs, 1), EOS, ys.dtype),
             jnp.where(ys == PAD, 0, ys)], axis=1)  # [B, U+1]
        pred_out, _ = self.pred_net(ys_in, None, deterministic)
        logits = self.joint(eouts, pred_out)
        # loss from raw logits: never materialises the [B,T,U+1,V]
        # log-softmax in the forward (ops/rnnt.py)
        loss = rnnt_loss_from_logits(logits, jnp.where(ys == PAD, 0, ys),
                                     elens, ylens, blank=BLANK)
        obs = {"loss_transducer": loss}
        return loss, obs
