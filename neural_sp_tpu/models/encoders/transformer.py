"""Transformer / Conformer encoder family.

Reference: ``neural_sp/models/seq2seq/encoders/transformer.py:40-686``,
``conformer.py:18-191``, ``conformer_block.py:20-182``,
``transformer_block.py:20-141``.

One unified pre-norm encoder (``XformerEncoder``) parameterised by block
type — transformer / conformer (v1, rel-PE, macaron) / conformer_v2 (abs-PE,
conv-before-MHA) — with:
  * abs or XL-relative positional encoding (clamp_len);
  * per-layer interlayer subsampling;
  * hierarchical sub1/sub2 taps with optional task-specific layer;
  * LayerDrop with 1/(1-p) rescale (reference transformer_block.py:104-108);
  * streaming training modes: ``reshape`` (chunkwise utterance splitting) and
    ``mask`` (chunkwise attention mask) — SURVEY.md §5.2;
  * streaming inference via explicit per-layer KV caches (see
    ``streaming_step``), replacing the reference's mutable per-layer
    ``self.cache`` (transformer.py:370-417).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from ...ops.masks import (
    make_pad_mask, make_san_mask, make_chunkwise_san_mask, causal_mask)
from ..modules.multihead_attention import MultiheadAttention
from ..modules.relative_multihead_attention import RelativeMultiheadAttention
from ..modules.conformer_convolution import ConformerConvBlock
from ..modules.feed_forward import FFN
from ..modules.positional_embedding import PositionalEncoding
from .conv import ConvEncoder
from .subsampling import build_subsampler
from .utils import chunkwise, chunkwise_merge
from ...ops.dropout import Dropout


def _make_mha(pe_type: str, d_model: int, n_heads: int, dropout: float,
              clamp_len: int, name: str):
    if pe_type in ("relative", "relative_xl"):
        # 'relative' (the flagship conformer): pos via w_value, no u/v
        # biases; 'relative_xl': separate w_pos + u/v biases (reference
        # transformer.py:215-218, :366)
        return RelativeMultiheadAttention(
            d_model=d_model, n_heads=n_heads, dropout=dropout,
            clamp_len=clamp_len, xl_like=(pe_type == "relative_xl"),
            name=name)
    return MultiheadAttention(d_model=d_model, n_heads=n_heads,
                              dropout=dropout, name=name)


class EncoderBlock(nn.Module):
    """Pre-norm block; btype selects transformer/conformer(v2) wiring."""
    d_model: int
    d_ff: int
    n_heads: int
    btype: str = "transformer"   # transformer | conformer | conformer_v2
    dropout: float = 0.0
    dropout_att: float = 0.0
    dropout_layer: float = 0.0   # LayerDrop prob
    pe_type: str = "add"
    clamp_len: int = -1
    ffn_activation: str = "relu"
    ffn_bottleneck_dim: int = 0
    conv_kernel_size: int = 15
    conv_normalization: str = "layer_norm"
    causal: bool = False

    @nn.compact
    def __call__(self, xs, mask=None, pad_mask=None, cache=None,
                 conv_cache=None, deterministic: bool = True,
                 return_weights: bool = False,
                 conv_cur_len: int | None = None):
        new_caches = {}
        is_conf = self.btype.startswith("conformer")
        fx = 0.5 if is_conf else 1.0

        def drop_path(new, old):
            if deterministic or self.dropout_layer == 0.0:
                return new
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout_layer)
            scale = 1.0 / (1.0 - self.dropout_layer)
            return jnp.where(keep, old + (new - old) * scale, old)

        if is_conf:  # macaron first FFN
            h = nn.LayerNorm(name="norm_ff_macaron")(xs)
            h = FFN(self.d_model, self.d_ff, self.dropout,
                    self.ffn_activation, self.ffn_bottleneck_dim,
                    name="ff_macaron")(h, deterministic)
            xs = drop_path(xs + fx * Dropout(self.dropout)(
                h, deterministic=deterministic), xs)

        def conv_module(xs, conv_cache):
            h = nn.LayerNorm(name="norm_conv")(xs)
            h, cc = ConformerConvBlock(
                self.d_model, self.conv_kernel_size, self.causal,
                self.conv_normalization, name="conv")(
                h, pad_mask, conv_cache, deterministic, conv_cur_len)
            return drop_path(
                xs + Dropout(self.dropout)(h, deterministic=deterministic),
                xs), cc

        if self.btype == "conformer_v2":
            xs, new_caches["conv"] = conv_module(xs, conv_cache)

        h = nn.LayerNorm(name="norm_mha")(xs)
        use_rel = self.pe_type in ("relative", "relative_xl")
        mha = _make_mha(self.pe_type, self.d_model, self.n_heads,
                        self.dropout_att, self.clamp_len, name="mha")
        if use_rel:
            h, kv, aws = mha(h, mask=mask, cache=cache,
                             deterministic=deterministic,
                             return_weights=return_weights)
        else:
            h, kv, aws = mha(h, h, h, mask=mask, cache=cache,
                             deterministic=deterministic,
                             return_weights=return_weights)
        new_caches["kv"] = kv
        xs = drop_path(
            xs + Dropout(self.dropout)(h, deterministic=deterministic), xs)

        if self.btype == "conformer":
            xs, new_caches["conv"] = conv_module(xs, conv_cache)

        h = nn.LayerNorm(name="norm_ff")(xs)
        h = FFN(self.d_model, self.d_ff, self.dropout, self.ffn_activation,
                self.ffn_bottleneck_dim, name="ff")(h, deterministic)
        xs = drop_path(
            xs + fx * Dropout(self.dropout)(h, deterministic=deterministic),
            xs)
        if is_conf:
            xs = nn.LayerNorm(name="norm_final")(xs)
        return xs, new_caches, aws


class XformerEncoder(nn.Module):
    input_dim: int
    btype: str = "transformer"          # transformer | conformer | conformer_v2
    d_model: int = 256
    d_ff: int = 2048
    n_heads: int = 4
    n_layers: int = 12
    n_layers_sub1: int = 0
    n_layers_sub2: int = 0
    pe_type: str = "add"                # add | relative | relative_xl | none
    clamp_len: int = -1
    dropout_in: float = 0.0
    dropout: float = 0.1
    dropout_att: float = 0.0
    dropout_layer: float = 0.0
    ffn_activation: str = "relu"
    ffn_bottleneck_dim: int = 0
    last_proj_dim: int = 0
    task_specific_layer: bool = False
    subsample: tuple = ()               # per-layer factors
    subsample_type: str = "drop"
    conv_kernel_size: int = 15          # conformer conv
    conv_normalization: str = "layer_norm"
    # conv frontend
    conv_channels: str = ""
    conv_kernel_sizes: str = ""
    conv_strides: str = ""
    conv_poolings: str = ""
    conv_frontend_normalization: str = ""
    # streaming (sizes in *input* frames, scaled by the conv factor inside)
    unidirectional: bool = False
    chunk_size_left: int = -1
    chunk_size_current: int = -1
    chunk_size_right: int = 0
    streaming_type: str = "mask"        # reshape | mask
    remat: bool = False                 # jax.checkpoint each block (memory)
    remat_policy: str = ""              # '' (full) | 'dots' | 'nothing'
    scan_layers: bool = False           # lax.scan over uniform layer runs
    # (measured r3: flagship compiles 2.2x faster (59s vs 128s) but steps
    # ~30% SLOWER (83 vs 64 ms, tools/ab_flagship.py) — scan blocks XLA's
    # inter-layer fusion/scheduling. Opt-in for compile-bound workflows.)

    @property
    def conv_factor(self) -> int:
        if not self.conv_channels:
            return 1
        from .conv import parse_cnn_config
        cfg = parse_cnn_config(self.conv_channels, self.conv_kernel_sizes,
                               self.conv_strides, self.conv_poolings)
        f = 1
        for (st, _), (pt, _) in zip(cfg.strides, cfg.poolings):
            f *= st * max(pt, 1)
        return f

    @property
    def subsampling_factor(self) -> int:
        f = self.conv_factor
        for s in self.subsample:
            f *= s
        return f

    @property
    def output_dim(self) -> int:
        return self.last_proj_dim if self.last_proj_dim > 0 else self.d_model

    def _conv(self) -> ConvEncoder:
        return ConvEncoder(
            input_dim=self.input_dim, channels=self.conv_channels,
            kernel_sizes=self.conv_kernel_sizes, strides=self.conv_strides,
            poolings=self.conv_poolings,
            normalization=self.conv_frontend_normalization,
            bottleneck_dim=self.d_model)

    def setup(self):
        if self.conv_channels:
            self.conv = self._conv()
        else:
            self.embed = nn.Dense(self.d_model)
        self.pos_enc = PositionalEncoding(
            self.d_model,
            "add" if self.pe_type in ("add", "1dconv3L_add") else "none",
            self.dropout)
        self.drop_in = Dropout(self.dropout_in)
        # trade FLOPs for HBM: recompute each block in the backward.
        # 'dots' keeps matmul outputs and recomputes the elementwise chains
        # (softmax/LN/residual/dropout) — on a traffic-bound encoder this
        # removes their saved-residual round-trips while adding only VPU
        # work; '' is classic full-block recompute (min memory).
        policy = {"": None,
                  "dots": jax.checkpoint_policies
                  .dots_with_no_batch_dims_saveable,
                  "nothing": jax.checkpoint_policies.nothing_saveable,
                  }[self.remat_policy]
        block_cls = nn.remat(
            EncoderBlock, static_argnums=(5, 6, 7),
            policy=policy) if self.remat else EncoderBlock
        blocks = []
        for lth in range(self.n_layers):
            # deeper layers dropped more (reference transformer.py:226)
            p = self.dropout_layer * (lth + 1) / max(self.n_layers, 1)
            blocks.append(block_cls(
                d_model=self.d_model, d_ff=self.d_ff, n_heads=self.n_heads,
                btype=self.btype, dropout=self.dropout,
                dropout_att=self.dropout_att, dropout_layer=p,
                pe_type=self.pe_type, clamp_len=self.clamp_len,
                ffn_activation=self.ffn_activation,
                ffn_bottleneck_dim=self.ffn_bottleneck_dim,
                conv_kernel_size=self.conv_kernel_size,
                conv_normalization=self.conv_normalization,
                # the conformer conv is CAUSAL for `mask`-type chunked
                # encoders too (reference transformer.py:128 — self.causal
                # = unidir or streaming_type == 'mask'; conformer_block.py
                # passes it to ConformerConvBlock), so chunk boundaries
                # never leak future frames through the depthwise conv
                causal=self.unidirectional or (
                    self.chunk_size_current > 0
                    and self.streaming_type == "mask")))
        self.blocks = blocks
        factors = list(self.subsample) or [1] * self.n_layers
        self.subsamplers = [
            build_subsampler(self.subsample_type, factors[lth], self.d_model)
            if factors[lth] > 1 else None for lth in range(self.n_layers)]
        for sub, n_sub in (("sub1", self.n_layers_sub1),
                           ("sub2", self.n_layers_sub2)):
            if n_sub > 0:
                if self.task_specific_layer:
                    setattr(self, f"block_{sub}_tsl", EncoderBlock(
                        d_model=self.d_model, d_ff=self.d_ff,
                        n_heads=self.n_heads, btype=self.btype,
                        dropout=self.dropout, pe_type=self.pe_type,
                        clamp_len=self.clamp_len,
                        ffn_activation=self.ffn_activation,
                        conv_kernel_size=self.conv_kernel_size))
                setattr(self, f"norm_out_{sub}", nn.LayerNorm())
                if self.last_proj_dim > 0:
                    setattr(self, f"bridge_{sub}",
                            nn.Dense(self.last_proj_dim))
        self.norm_out = nn.LayerNorm()
        if self.last_proj_dim > 0:
            self.bridge = nn.Dense(self.last_proj_dim)

    def __call__(self, xs, xlens, task: str = "all",
                 deterministic: bool = True, return_weights: bool = False):
        xs = self.drop_in(xs, deterministic=deterministic)
        factor = self.conv_factor
        bs, t_raw = xs.shape[0], xs.shape[1]
        streaming = self.chunk_size_current > 0
        lc_bidir = streaming and not self.unidirectional
        reshape_mode = streaming and self.streaming_type == "reshape"
        n_l = self.chunk_size_left // factor if self.chunk_size_left > 0 else \
            (-1 if self.chunk_size_left < 0 else 0)
        n_c = max(self.chunk_size_current // factor, 1) if streaming else 0
        n_r = self.chunk_size_right // factor
        nl_eff = max(n_l, 0)

        pre_chunked = False
        if self.conv_channels:
            if lc_bidir:
                # chunk BEFORE the CNN so conv outputs are chunk-independent
                # (reference transformer.py:452-460 — "CNN consumes inputs
                # in the current chunk"; converted-weight streaming parity
                # depends on this, tests/test_parity_pipeline.py)
                nl_in = max(self.chunk_size_left, 0) if reshape_mode else 0
                nr_in = max(self.chunk_size_right, 0) if reshape_mode else 0
                xs = chunkwise(xs, nl_in, self.chunk_size_current, nr_in)
                clens = jnp.full((xs.shape[0],), xs.shape[1], jnp.int32)
                xs, _ = self.conv(xs, clens, deterministic)
                xlens = (xlens + factor - 1) // factor
                if not reshape_mode:   # mask mode: back to [B, T', d]
                    xs = xs.reshape(bs, -1, xs.shape[-1])
                    # drop the chunk-padding tail like the reference's
                    # [:, :xlens.max()] (transformer.py:481) — the pad
                    # frames' conv-bias values would otherwise leak into
                    # the last valid frames via the conformer conv
                    xs = xs[:, : -(-t_raw // factor)]
                pre_chunked = True
            else:
                xs, xlens = self.conv(xs, xlens, deterministic)
        else:
            xs = self.embed(xs)

        # true post-conv length for the reshape-mode merge: the chunk grid
        # rounds up to n_chunks*n_c, but the merged outputs must stop at
        # ceil(t_raw/factor) like the reference (transformer.py:481) — the
        # chunk-padding tail would otherwise survive into eouts and inflate
        # every downstream consumer's tmax
        t_in = -(-t_raw // factor) if reshape_mode and pre_chunked \
            else xs.shape[1]
        if reshape_mode and not pre_chunked:
            # [B, T, D] -> [B*n_chunks, N_l+N_c+N_r, D]; no mask in chunks
            xs = chunkwise(xs, nl_eff, n_c, n_r)

        xs = self.pos_enc(xs, 0, deterministic)

        if reshape_mode:
            mask = None
            pad_mask = None
        else:
            pad_mask = make_pad_mask(xlens, xs.shape[1])
        # batch edge for the conformer conv (see ConformerConvBlock): a [T]
        # bool, position < max(xlens) — hoisted here so the layer scan body
        # doesn't re-reduce over the (possibly DP-sharded) batch per layer
        conv_edge = pad_mask.any(axis=0) if pad_mask is not None else None
        if not reshape_mode:
            if streaming:  # `mask` mode
                mask = make_chunkwise_san_mask(pad_mask, n_l, n_c, n_r)
            elif self.unidirectional:
                mask = make_san_mask(pad_mask) & causal_mask(
                    xs.shape[1], xs.shape[1])[None]
            else:
                mask = make_san_mask(pad_mask)

        eouts: dict[str, Any] = {}
        aws_all = []
        subsample = list(self.subsample) or [1] * self.n_layers
        h = xs
        # lax.scan over uniform runs of layers: the flagship's 12 conformer
        # blocks unroll to a ~31k-op HLO graph whose per-op scheduling/fusion
        # overhead dominates the step (ROADMAP r3 profile); scanning runs of
        # identical blocks compiles ONE body per run. Disabled during init
        # (the unrolled path creates the per-layer params, so checkpoints,
        # TP shardings and the streaming path are untouched), with attention
        # weights (per-layer outputs), and with LayerDrop (per-depth prob).
        use_scan = (self.scan_layers and not self.is_initializing()
                    and not return_weights and self.dropout_layer == 0.0)
        for group in self._layer_groups():
            if use_scan and len(group) >= 2:
                h = self._scan_group(group, h, mask, conv_edge,
                                     deterministic)
            else:
                for lth in group:
                    h, _, aws = self.blocks[lth](
                        h, mask, conv_edge, None, None, deterministic,
                        return_weights, None)
                    if return_weights:
                        aws_all.append(aws)
            lth = group[-1]

            for sub, n_sub in (("sub1", self.n_layers_sub1),
                               ("sub2", self.n_layers_sub2)):
                if lth == n_sub - 1 and n_sub > 0:
                    h_sub = h
                    if self.task_specific_layer:
                        h_sub, _, _ = getattr(self, f"block_{sub}_tsl")(
                            h_sub, mask, conv_edge,
                            deterministic=deterministic)
                    h_sub = getattr(self, f"norm_out_{sub}")(h_sub)
                    if self.last_proj_dim > 0:
                        h_sub = getattr(self, f"bridge_{sub}")(h_sub)
                    if reshape_mode:
                        h_sub = chunkwise_merge(
                            h_sub, bs, max(n_l, 0), n_c, n_r, t_in)
                    eouts[f"ys_{sub}"] = {"xs": h_sub, "xlens": xlens}
                    if task == f"ys_{sub}":
                        return eouts

            if subsample[lth] > 1:
                assert not streaming, "interlayer subsample + streaming modes"
                h, xlens = self.subsamplers[lth](h, xlens)
                pad_mask = make_pad_mask(xlens, h.shape[1])
                conv_edge = pad_mask.any(axis=0)
                if self.unidirectional:
                    mask = make_san_mask(pad_mask) & causal_mask(
                        h.shape[1], h.shape[1])[None]
                else:
                    mask = make_san_mask(pad_mask)

        h = self.norm_out(h)
        if self.last_proj_dim > 0:
            h = self.bridge(h)
        if reshape_mode:
            h = chunkwise_merge(h, bs, max(n_l, 0), n_c, n_r, t_in)
        eouts["ys"] = {"xs": h, "xlens": xlens}
        if return_weights:
            eouts["aws"] = aws_all
        return eouts

    def _layer_groups(self) -> list[list[int]]:
        """Runs of consecutive layers with no tap/subsample boundary inside
        (a boundary layer always ends its run)."""
        subsample = list(self.subsample) or [1] * self.n_layers
        taps = {n - 1 for n in (self.n_layers_sub1, self.n_layers_sub2)
                if n > 0}
        groups: list[list[int]] = []
        cur: list[int] = []
        for lth in range(self.n_layers):
            cur.append(lth)
            if subsample[lth] > 1 or lth in taps:
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)
        return groups

    def _scan_group(self, group, h, mask, pad_mask, deterministic):
        """Run a uniform run of blocks as ONE lax.scan body over their
        stacked per-layer params (stacking is a pointer-shuffle copy, tiny
        next to the attention/FFN traffic it amortises)."""
        p = self.variables["params"]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[p[f"blocks_{i}"] for i in group])
        block = EncoderBlock(
            d_model=self.d_model, d_ff=self.d_ff, n_heads=self.n_heads,
            btype=self.btype, dropout=self.dropout,
            dropout_att=self.dropout_att, dropout_layer=0.0,
            pe_type=self.pe_type, clamp_len=self.clamp_len,
            ffn_activation=self.ffn_activation,
            ffn_bottleneck_dim=self.ffn_bottleneck_dim,
            conv_kernel_size=self.conv_kernel_size,
            conv_normalization=self.conv_normalization,
            causal=self.unidirectional or (
                self.chunk_size_current > 0
                and self.streaming_type == "mask"),
            parent=None)   # unbound template, applied per scan slice
        need_rng = not deterministic
        keys = (jax.random.split(self.make_rng("dropout"), len(group))
                if need_rng else jnp.zeros((len(group), 1), jnp.uint32))

        def body(carry, xs_l):
            p_l, k_l = xs_l
            out, _, _ = block.apply(
                {"params": p_l}, carry, mask, pad_mask, None, None,
                deterministic, False, None,
                rngs={"dropout": k_l} if need_rng else None)
            return out, None

        if self.remat:
            body = jax.checkpoint(body)
        h, _ = lax.scan(body, h, (stacked, keys))
        return h

    # ---- streaming inference (explicit per-layer caches) -----------------
    # Replaces the reference's mutable per-layer self.cache
    # (transformer.py:370-417, calculate_cache_size :392-404). Right-context
    # (lookahead) frames are attended within the block but never cached
    # (Emformer-style), so per-block cost is O(1) and cache shapes are fixed
    # (zero-padded + validity mask -> no recompiles across blocks).

    def stream_geometry(self):
        """(conv factor f, cnn_ctx_in, n_l, n_c, n_r) — the latter three in
        encoder (post-conv) frames; cnn_ctx_in in input frames."""
        f = self.conv_factor
        n_c_in = self.chunk_size_current
        n_r_in = max(self.chunk_size_right, 0)
        n_l_in = self.chunk_size_left if self.chunk_size_left > 0 else 0
        assert n_c_in > 0, "streaming requires chunk_size_current > 0"
        assert n_c_in % f == 0 and n_l_in % f == 0 and n_r_in % f == 0, \
            "streaming chunk sizes must be multiples of the conv factor"
        # cnn_ctx_in is 0 BY DESIGN: the CNN consumes the current block
        # only, so conv outputs are chunk-independent and streaming equals
        # the chunk-before-conv offline forward (reference
        # transformer.py:452-460). Cross-block CNN context would shift
        # every conv output near the boundary vs the offline mask-mode
        # training graph.
        cnn_ctx_in = 0
        return f, cnn_ctx_in, n_l_in // f, n_c_in // f, n_r_in // f

    def block_input_frames(self) -> tuple[int, int]:
        """(total input frames per block, new frames consumed per block)."""
        f, cnn_ctx_in, _, n_c, n_r = self.stream_geometry()
        return cnn_ctx_in + (n_c + n_r) * f, n_c * f

    def init_stream_cache(self, bs: int, dtype=jnp.float32):
        f, _, n_l, n_c, n_r = self.stream_geometry()
        dk = self.d_model // self.n_heads
        layers = []
        for _ in range(self.n_layers):
            layer = {"k": jnp.zeros((bs, n_l, self.n_heads, dk), dtype),
                     "v": jnp.zeros((bs, n_l, self.n_heads, dk), dtype)}
            if self.btype.startswith("conformer"):
                layer["conv"] = jnp.zeros(
                    (bs, self.conv_kernel_size - 1, self.d_model), dtype)
            layers.append(layer)
        return {"layers": layers,
                "len": jnp.zeros((), jnp.int32),
                "offset": jnp.zeros((), jnp.int32)}

    def streaming_step(self, xs_block, cache, deterministic: bool = True):
        """One block: xs_block [B, cnn_ctx_in + (N_c+N_r)*f, input_dim]
        (zero-padded at utterance edges) -> (eouts [B, N_c, d], new_cache).
        """
        f, cnn_ctx_in, n_l, n_c, n_r = self.stream_geometry()
        bs = xs_block.shape[0]
        blk = n_c + n_r
        if self.conv_channels:
            full_lens = jnp.full((bs,), xs_block.shape[1], jnp.int32)
            h, _ = self.conv(xs_block, full_lens, deterministic)
            h = h[:, cnn_ctx_in // f: cnn_ctx_in // f + blk]
        else:
            h = self.embed(xs_block)[:, :blk]
        h = self.pos_enc(h, cache["offset"], deterministic)

        # key validity: cache keys [0, n_l) valid iff idx >= n_l - len
        k_idx = jnp.arange(n_l + blk)[None, None, :]
        key_valid = (k_idx >= n_l - cache["len"]) | (k_idx >= n_l)
        # NOTE: within-block attention is bidirectional — the block IS the
        # chunk, matching `mask`-mode training semantics (chunkwise SAN mask
        # allows within-chunk lookahead; reference transformer.py:668-686).
        mask = jnp.broadcast_to(key_valid, (bs, blk, n_l + blk))

        new_layers = []
        for lth in range(self.n_layers):
            lc = cache["layers"][lth]
            h, caches, _ = self.blocks[lth](
                h, mask, None, cache={"k": lc["k"], "v": lc["v"]},
                conv_cache=lc.get("conv"), deterministic=deterministic,
                conv_cur_len=n_c)
            kv = caches["kv"]
            new_layer = {
                "k": kv["k"][:, :n_l + n_c][:, -n_l:] if n_l > 0
                else kv["k"][:, :0],
                "v": kv["v"][:, :n_l + n_c][:, -n_l:] if n_l > 0
                else kv["v"][:, :0]}
            if "conv" in caches and caches["conv"] is not None:
                new_layer["conv"] = caches["conv"]
            new_layers.append(new_layer)

        h = self.norm_out(h)
        if self.last_proj_dim > 0:
            h = self.bridge(h)
        new_cache = {"layers": new_layers,
                     "len": jnp.minimum(cache["len"] + n_c, n_l),
                     "offset": cache["offset"] + n_c}
        return h[:, :n_c], new_cache
