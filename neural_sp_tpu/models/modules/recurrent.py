"""Recurrent building blocks: LSTM/GRU layers as lax.scan programs.

TPU-native replacement for cuDNN fused RNNs (reference relies on
``flatten_parameters`` cuDNN LSTMs, e.g. ``encoders/rnn.py:342``). flax's
``nn.RNN`` lowers to ``lax.scan`` — XLA fuses the gate matmuls into MXU ops;
weights stay resident in VMEM across the scan.

Includes Zoneout cell regularisation (reference ``modules/zoneout.py:9-46``)
and a bidirectional layer with sum/concat merge + proper length-aware
reversal (replaces pack_padded_sequence handling).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class ZoneoutCell(nn.RNNCellBase):
    """Zoneout wrapper: each state element keeps its previous value w.p. p."""
    cell: nn.RNNCellBase
    zoneout_prob_h: float = 0.0
    zoneout_prob_c: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, inputs):
        new_carry, y = self.cell(carry, inputs)
        if self.zoneout_prob_h == 0.0 and self.zoneout_prob_c == 0.0:
            return new_carry, y
        c_old, h_old = carry
        c_new, h_new = new_carry
        if self.deterministic:
            # eval-time expectation p*old + (1-p)*new (classic zoneout;
            # the reference's zoneout.py inverts the probability meaning)
            c = self.zoneout_prob_c * c_old + \
                (1 - self.zoneout_prob_c) * c_new
            h = self.zoneout_prob_h * h_old + \
                (1 - self.zoneout_prob_h) * h_new
            return (c, h), h
        rng = self.make_rng("dropout")
        r1, r2 = jax.random.split(rng)
        keep_c = jax.random.bernoulli(r1, self.zoneout_prob_c, c_new.shape)
        keep_h = jax.random.bernoulli(r2, self.zoneout_prob_h, h_new.shape)
        c = jnp.where(keep_c, c_old, c_new)
        h = jnp.where(keep_h, h_old, h_new)
        return (c, h), h

    def initialize_carry(self, rng, input_shape):
        return self.cell.initialize_carry(rng, input_shape)

    @property
    def num_feature_axes(self) -> int:
        return 1


def make_cell(rnn_type: str, units: int, zoneout_h: float = 0.0,
              zoneout_c: float = 0.0, deterministic: bool = True,
              name: str | None = None) -> nn.RNNCellBase:
    if rnn_type in ("lstm", "blstm"):
        cell = nn.OptimizedLSTMCell(units, name=name)
    elif rnn_type in ("gru", "bgru"):
        cell = nn.GRUCell(units, name=name)
    else:
        raise ValueError(rnn_type)
    if zoneout_h > 0 or zoneout_c > 0:
        cell = ZoneoutCell(cell, zoneout_h, zoneout_c, deterministic)
    return cell


class RNNLayer(nn.Module):
    """One (bi)directional recurrent layer with explicit state I/O.

    __call__(xs [B,T,D], xlens [B] | None, carry | None)
      -> (ys [B,T,units or 2*units/units-summed], new_carry)

    Bidirectional merge: 'sum' (reference RNNEncoder fwd+bwd summation,
    rnn.py:268-383) or 'concat'.
    """
    units: int
    rnn_type: str = "lstm"          # lstm | gru
    bidirectional: bool = False
    merge: str = "sum"              # sum | concat
    zoneout_h: float = 0.0
    zoneout_c: float = 0.0

    @nn.compact
    def __call__(self, xs, xlens=None, carry=None, deterministic: bool = True):
        zoneout = (self.zoneout_h > 0 or self.zoneout_c > 0)
        cell_f = make_cell(self.rnn_type, self.units, self.zoneout_h,
                           self.zoneout_c, deterministic, name="fwd")
        if zoneout and not deterministic:
            # nn.RNN does not thread custom rng streams into its scan; use an
            # explicit nn.scan that splits the dropout stream per step.
            assert not self.bidirectional, \
                "zoneout is for unidirectional decoder/pred-net RNNs"
            scan = nn.scan(
                lambda cell, c, x: cell(c, x),
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=1, out_axes=1)
            c0 = carry if carry is not None else cell_f.initialize_carry(
                jax.random.PRNGKey(0), xs[:, 0].shape)
            new_carry, ys = scan(cell_f, c0, xs)
            return ys, new_carry
        rnn_f = nn.RNN(cell_f, name="rnn_fwd")
        kw = {}
        if carry is not None:
            kw["initial_carry"] = carry[0] if self.bidirectional else carry
        out = rnn_f(xs, seq_lengths=xlens, return_carry=True, **kw)
        carry_f, ys_f = out
        if not self.bidirectional:
            return ys_f, carry_f
        cell_b = make_cell(self.rnn_type, self.units, self.zoneout_h,
                           self.zoneout_c, deterministic, name="bwd")
        rnn_b = nn.RNN(cell_b, name="rnn_bwd")
        kwb = {}
        if carry is not None:
            kwb["initial_carry"] = carry[1]
        carry_b, ys_b = rnn_b(xs, seq_lengths=xlens, return_carry=True,
                              reverse=True, keep_order=True, **kwb)
        if self.merge == "sum":
            ys = ys_f + ys_b
        else:
            ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        return ys, (carry_f, carry_b)
