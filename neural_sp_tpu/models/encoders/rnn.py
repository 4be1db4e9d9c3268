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
yesterday's carry back in. ``streaming_step`` processes one
[conv_ctx + N_c + N_r]-frame block and returns the carry frozen at the N_c
boundary — bit-identical to the offline forward at the emitted positions
(the fwd scan continues from the true boundary state, so lookahead
recomputation matches full history).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..modules.recurrent import RNNLayer, make_cell
from .conv import ConvEncoder
from .subsampling import build_subsampler, new_lens
from .utils import chunkwise, chunkwise_merge
from ...ops.dropout import Dropout


class LCBLSTMLayer(nn.Module):
    """Latency-controlled BLSTM layer: full-context fwd + chunked bwd."""
    units: int
    rnn_type: str = "lstm"
    n_current: int = 40
    n_right: int = 20
    merge: str = "sum"

    @nn.compact
    def __call__(self, xs, xlens=None, carry=None, deterministic: bool = True,
                 single_chunk: bool = False):
        """``single_chunk``: treat the whole window as one chunk (streaming
        block-sync — the backward direction runs from the window end, the
        reference's per-block behavior; emitted N_c positions match offline
        chunking exactly since their training chunk IS this window)."""
        cell_f = make_cell(self.rnn_type, self.units, name="fwd")
        rnn_f = nn.RNN(cell_f, name="rnn_fwd")
        kw = {"initial_carry": carry} if carry is not None else {}
        carry_f, ys_f = rnn_f(xs, seq_lengths=xlens, return_carry=True, **kw)

        bs, t, _ = xs.shape
        cell_b = make_cell(self.rnn_type, self.units, name="bwd")
        rnn_b = nn.RNN(cell_b, name="rnn_bwd")
        if single_chunk:
            ys_b = rnn_b(xs, reverse=True, keep_order=True)
        else:
            xs_chunk = chunkwise(xs, 0, self.n_current, self.n_right)
            ys_b = rnn_b(xs_chunk, reverse=True, keep_order=True)
            ys_b = chunkwise_merge(ys_b, bs, 0, self.n_current, self.n_right,
                                   t)
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
    # latency-controlled chunks (RNN-input frames, -1 = full context)
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
    def conv_factor(self) -> int:
        if not self.conv_channels:
            return 1
        return ConvEncoder(
            input_dim=self.input_dim, channels=self.conv_channels,
            kernel_sizes=self.conv_kernel_sizes,
            strides=self.conv_strides,
            poolings=self.conv_poolings).subsampling_factor

    @property
    def subsampling_factor(self) -> int:
        f = self.conv_factor
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

    def _output_dim_sub(self) -> int:
        """Width of the sub1/sub2 tap streams: the task-specific layer
        (when enabled) emits raw RNN units with NO per-layer projection
        (rnn.py tap path), so its width differs from the main stream."""
        if self.last_proj_dim > 0:
            return self.last_proj_dim
        if self.task_specific_layer:
            return self.n_units if (not self.bidirectional
                                    or self.bidir_sum_fwd_bwd) \
                else 2 * self.n_units
        return self._layer_dim()

    @property
    def output_dim_sub1(self) -> int:
        return self._output_dim_sub()

    @property
    def output_dim_sub2(self) -> int:
        return self._output_dim_sub()

    @property
    def lc(self) -> bool:
        return self.bidirectional and self.chunk_size_current > 0

    def setup(self):
        if self.conv_channels:
            self.conv = ConvEncoder(
                input_dim=self.input_dim, channels=self.conv_channels,
                kernel_sizes=self.conv_kernel_sizes,
                strides=self.conv_strides, poolings=self.conv_poolings,
                normalization=self.conv_normalization,
                bottleneck_dim=self.conv_bottleneck_dim, name="conv")
        self.drop_in = Dropout(self.dropout_in)
        self.drop = Dropout(self.dropout)
        subsample = list(self.subsample) or [1] * self.n_layers
        layers, projs = [], []
        n_cur, n_right = self.chunk_size_current, self.chunk_size_right
        for lth in range(self.n_layers):
            if self.lc:
                layers.append(LCBLSTMLayer(
                    self.n_units, self._cell_type, n_cur, n_right,
                    merge="sum" if self.bidir_sum_fwd_bwd else "concat",
                    name=f"rnn{lth}"))
            else:
                layers.append(RNNLayer(
                    self.n_units, self._cell_type, self.bidirectional,
                    merge="sum" if self.bidir_sum_fwd_bwd else "concat",
                    name=f"rnn{lth}"))
            if self.n_projs > 0:
                projs.append(nn.Dense(self.n_projs, name=f"proj{lth}"))
            if subsample[lth] > 1 and self.lc:
                n_cur = max(n_cur // subsample[lth], 1)
                n_right = max(n_right // subsample[lth], 1)
        self.layers = layers
        self.projs = projs
        self.subsamplers = [
            build_subsampler(self.subsample_type, subsample[lth],
                             self._layer_dim())
            if subsample[lth] > 1 else None for lth in range(self.n_layers)]
        for sub, n_sub in (("sub1", self.n_layers_sub1),
                           ("sub2", self.n_layers_sub2)):
            if n_sub > 0:
                if self.task_specific_layer:
                    setattr(self, f"rnn_{sub}_tsl", RNNLayer(
                        self.n_units, self._cell_type, self.bidirectional,
                        merge="sum" if self.bidir_sum_fwd_bwd else "concat",
                        name=f"rnn_{sub}_tsl"))
                if self.last_proj_dim > 0:
                    setattr(self, f"bridge_{sub}",
                            nn.Dense(self.last_proj_dim,
                                     name=f"bridge_{sub}"))
        if self.last_proj_dim > 0:
            self.bridge = nn.Dense(self.last_proj_dim, name="bridge")

    def __call__(self, xs, xlens, task: str = "all", carry=None,
                 deterministic: bool = True):
        xs = self.drop_in(xs, deterministic=deterministic)
        if self.conv_channels:
            xs, xlens = self.conv(xs, xlens, deterministic)

        eouts: dict[str, Any] = {}
        new_carry = []
        subsample = list(self.subsample) or [1] * self.n_layers

        h = xs
        for lth in range(self.n_layers):
            layer_carry = carry[lth] if carry is not None else None
            h, c = self.layers[lth](h, xlens, layer_carry, deterministic)
            new_carry.append(c)
            h = self.drop(h, deterministic=deterministic)
            if self.n_projs > 0:
                h = jnp.tanh(self.projs[lth](h))

            # hierarchical sub-task taps (reference rnn.py:268-383)
            for sub, n_sub in (("sub1", self.n_layers_sub1),
                               ("sub2", self.n_layers_sub2)):
                if lth == n_sub - 1 and n_sub > 0:
                    h_sub, xlens_sub = h, xlens
                    if self.task_specific_layer:
                        h_sub, _ = getattr(self, f"rnn_{sub}_tsl")(
                            h_sub, xlens_sub, None, deterministic)
                    if self.last_proj_dim > 0:
                        h_sub = getattr(self, f"bridge_{sub}")(h_sub)
                    eouts[f"ys_{sub}"] = {"xs": h_sub, "xlens": xlens_sub}
                    if task == f"ys_{sub}":
                        return eouts, new_carry

            if subsample[lth] > 1:
                h, xlens = self.subsamplers[lth](h, xlens)

        if self.last_proj_dim > 0:
            h = self.bridge(h)
        eouts["ys"] = {"xs": h, "xlens": xlens}
        return eouts, new_carry

    # ---- streaming inference --------------------------------------------
    # Parity: reference streaming resets RNN encoder caches on CTC-VAD
    # segmentation and backoff-re-encodes the previous block
    # (speech2text.py:601-609); here the carry is explicit, so the decode
    # session passes carry=None (reset) then one warm-up streaming_step on
    # the previous block.

    def stream_geometry(self):
        """(conv factor f, cnn_ctx_in input frames, n_c, n_r) — n_c/n_r in
        RNN-stack frames (= post-conv)."""
        f = self.conv_factor
        if self.lc:
            n_c, n_r = self.chunk_size_current, self.chunk_size_right
        else:
            n_c, n_r = 40, 0  # unidirectional default block (reference
            #                   recog_block_sync_size 40 frames)
        cnn_ctx_in = 0
        if self.conv_channels:
            from .conv import parse_cnn_config
            cfg = parse_cnn_config(self.conv_channels, self.conv_kernel_sizes,
                                   self.conv_strides, self.conv_poolings)
            left = 0
            fac = 1
            for (kt, _), (st, _), (pt, _) in zip(
                    cfg.kernel_sizes, cfg.strides, cfg.poolings):
                left += 2 * ((kt - 1) // 2) * fac
                fac *= st * max(pt, 1)
            cnn_ctx_in = -(-left // f) * f
        return f, cnn_ctx_in, n_c, n_r

    def block_input_frames(self) -> tuple[int, int]:
        """(total input frames per block, new frames consumed per block)."""
        f, cnn_ctx_in, n_c, n_r = self.stream_geometry()
        return cnn_ctx_in + (n_c + n_r) * f, n_c * f

    def streaming_step(self, xs_block, carry, deterministic: bool = True):
        """One block: xs_block [B, cnn_ctx_in + (N_c+N_r)*f, input_dim]
        -> (eouts [B, N_c', d], new_carry with fwd state at the N_c
        boundary). N_c' = N_c after interlayer subsampling. carry=None
        resets (segment start)."""
        f, cnn_ctx_in, n_c, n_r = self.stream_geometry()
        bs = xs_block.shape[0]
        if self.conv_channels:
            full_lens = jnp.full((bs,), xs_block.shape[1], jnp.int32)
            h, _ = self.conv(xs_block, full_lens, deterministic)
            h = h[:, cnn_ctx_in // f: cnn_ctx_in // f + n_c + n_r]
        else:
            h = xs_block[:, cnn_ctx_in:]
        subsample = list(self.subsample) or [1] * self.n_layers
        boundary = jnp.full((bs,), n_c, jnp.int32)
        new_carry = []
        n_c_l, n_r_l = n_c, n_r
        for lth in range(self.n_layers):
            layer_carry = carry[lth] if carry is not None else None
            # xlens = N_c boundary: nn.RNN computes outputs for the whole
            # window (incl. lookahead) but freezes the returned carry at
            # the boundary, so the next block continues from the true state
            if self.lc:
                h, c = self.layers[lth](h, boundary, layer_carry,
                                        deterministic, single_chunk=True)
            else:
                h, c = self.layers[lth](h, boundary, layer_carry,
                                        deterministic)
            new_carry.append(c)
            if self.n_projs > 0:
                h = jnp.tanh(self.projs[lth](h))
            if subsample[lth] > 1:
                h, boundary = self.subsamplers[lth](h, boundary)
                n_c_l = max(n_c_l // subsample[lth], 1)
                n_r_l = max(n_r_l // subsample[lth], 1)
        if self.last_proj_dim > 0:
            h = self.bridge(h)
        return h[:, :n_c_l], new_carry
