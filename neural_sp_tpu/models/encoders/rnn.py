"""RNN encoder family (reference
``neural_sp/models/seq2seq/encoders/rnn.py:35-568``): (B)LSTM/GRU stacks
with per-layer projection + interlayer subsampling, hierarchical sub1/sub2
taps (task-specific layers), bridge projections, and latency-controlled
BLSTM.

TPU-first redesign of LC-BLSTM (reference ``_forward_latency_controlled``
:427-510): instead of a sequential Python loop over chunks, the forward
direction runs as one full-length scan (mathematically identical to carrying
state chunk-to-chunk) and the backward direction runs batched over
``[B*n_chunks, N_c+N_r]`` windows via ``chunkwise`` — all chunks in
parallel on the MXU.

Streaming: explicit carry I/O per layer (reference mutates ``self.hx_fwd``,
rnn.py:264-266); Random State Passing (rsp, :323-327) is the trainer passing
yesterday's carry back in.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..modules.recurrent import RNNLayer, make_cell
from .conv import ConvEncoder
from .subsampling import build_subsampler, new_lens
from .utils import chunkwise, chunkwise_merge


class LCBLSTMLayer(nn.Module):
    """Latency-controlled BLSTM layer: full-context fwd + chunked bwd."""
    units: int
    rnn_type: str = "lstm"
    n_current: int = 40
    n_right: int = 20
    merge: str = "sum"

    @nn.compact
    def __call__(self, xs, xlens=None, carry=None, deterministic: bool = True):
        cell_f = make_cell(self.rnn_type, self.units, name="fwd")
        rnn_f = nn.RNN(cell_f, name="rnn_fwd")
        kw = {"initial_carry": carry} if carry is not None else {}
        carry_f, ys_f = rnn_f(xs, seq_lengths=xlens, return_carry=True, **kw)

        bs, t, _ = xs.shape
        xs_chunk = chunkwise(xs, 0, self.n_current, self.n_right)
        cell_b = make_cell(self.rnn_type, self.units, name="bwd")
        rnn_b = nn.RNN(cell_b, name="rnn_bwd")
        ys_b = rnn_b(xs_chunk, reverse=True, keep_order=True)
        ys_b = chunkwise_merge(ys_b, bs, 0, self.n_current, self.n_right, t)
        if self.merge == "sum":
            ys = ys_f + ys_b
        else:
            ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        return ys, carry_f


class RNNEncoder(nn.Module):
    """Returns ``(eouts, carry)``; eouts = {"ys": {"xs", "xlens"},
    "ys_sub1": ..., "ys_sub2": ...} (tasks absent when not configured)."""
    input_dim: int
    rnn_type: str = "blstm"            # lstm | gru | blstm | bgru
    n_units: int = 512
    n_projs: int = 0
    last_proj_dim: int = 0
    n_layers: int = 5
    n_layers_sub1: int = 0
    n_layers_sub2: int = 0
    dropout_in: float = 0.0
    dropout: float = 0.0
    subsample: tuple = ()              # per-layer factors, e.g. (1,2,2,1,1)
    subsample_type: str = "drop"
    # conv frontend ('' = none)
    conv_channels: str = ""
    conv_kernel_sizes: str = ""
    conv_strides: str = ""
    conv_poolings: str = ""
    conv_normalization: str = ""
    conv_bottleneck_dim: int = 0
    # latency-controlled chunks (input frames, -1 = full context)
    chunk_size_current: int = -1
    chunk_size_right: int = 0
    bidir_sum_fwd_bwd: bool = True
    task_specific_layer: bool = False

    @property
    def bidirectional(self) -> bool:
        return self.rnn_type.startswith("b")

    @property
    def _cell_type(self) -> str:
        return self.rnn_type.lstrip("b")

    @property
    def subsampling_factor(self) -> int:
        f = 1
        if self.conv_channels:
            f *= ConvEncoder(
                input_dim=self.input_dim, channels=self.conv_channels,
                kernel_sizes=self.conv_kernel_sizes,
                strides=self.conv_strides,
                poolings=self.conv_poolings).subsampling_factor
        for s in self.subsample:
            f *= s
        return f

    def _layer_dim(self) -> int:
        if self.n_projs > 0:
            return self.n_projs
        if self.bidirectional and not self.bidir_sum_fwd_bwd:
            return 2 * self.n_units
        return self.n_units

    @property
    def output_dim(self) -> int:
        return self.last_proj_dim if self.last_proj_dim > 0 else self._layer_dim()

    @nn.compact
    def __call__(self, xs, xlens, task: str = "all", carry=None,
                 deterministic: bool = True):
        xs = nn.Dropout(self.dropout_in)(xs, deterministic=deterministic)
        if self.conv_channels:
            conv = ConvEncoder(
                input_dim=self.input_dim, channels=self.conv_channels,
                kernel_sizes=self.conv_kernel_sizes,
                strides=self.conv_strides, poolings=self.conv_poolings,
                normalization=self.conv_normalization,
                bottleneck_dim=self.conv_bottleneck_dim, name="conv")
            xs, xlens = conv(xs, xlens, deterministic)

        eouts: dict[str, Any] = {}
        new_carry = []
        lc = self.bidirectional and self.chunk_size_current > 0
        subsample = list(self.subsample) or [1] * self.n_layers
        n_cur, n_right = self.chunk_size_current, self.chunk_size_right

        h = xs
        for lth in range(self.n_layers):
            layer_carry = carry[lth] if carry is not None else None
            if lc:
                h, c = LCBLSTMLayer(
                    self.n_units, self._cell_type, n_cur, n_right,
                    merge="sum" if self.bidir_sum_fwd_bwd else "concat",
                    name=f"rnn{lth}")(h, xlens, layer_carry, deterministic)
            else:
                h, c = RNNLayer(
                    self.n_units, self._cell_type, self.bidirectional,
                    merge="sum" if self.bidir_sum_fwd_bwd else "concat",
                    name=f"rnn{lth}")(h, xlens, layer_carry, deterministic)
            new_carry.append(c)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            if self.n_projs > 0:
                h = jnp.tanh(nn.Dense(self.n_projs, name=f"proj{lth}")(h))

            # hierarchical sub-task taps (reference rnn.py:268-383)
            for sub, n_sub in (("sub1", self.n_layers_sub1),
                               ("sub2", self.n_layers_sub2)):
                if lth == n_sub - 1 and n_sub > 0:
                    h_sub, xlens_sub = h, xlens
                    if self.task_specific_layer:
                        h_sub, _ = RNNLayer(
                            self.n_units, self._cell_type, self.bidirectional,
                            merge="sum" if self.bidir_sum_fwd_bwd else "concat",
                            name=f"rnn_{sub}_tsl")(h_sub, xlens_sub, None,
                                                   deterministic)
                    if self.last_proj_dim > 0:
                        h_sub = nn.Dense(self.last_proj_dim,
                                         name=f"bridge_{sub}")(h_sub)
                    eouts[f"ys_{sub}"] = {"xs": h_sub, "xlens": xlens_sub}
                    if task == f"ys_{sub}":
                        return eouts, new_carry

            if subsample[lth] > 1:
                h, xlens = build_subsampler(
                    self.subsample_type, subsample[lth], self._layer_dim())(
                    h, xlens)
                if lc:
                    n_cur = max(n_cur // subsample[lth], 1)
                    n_right = max(n_right // subsample[lth], 1)

        if self.last_proj_dim > 0:
            h = nn.Dense(self.last_proj_dim, name="bridge")(h)
        eouts["ys"] = {"xs": h, "xlens": xlens}
        return eouts, new_carry
