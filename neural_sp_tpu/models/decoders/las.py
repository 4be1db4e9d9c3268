"""LAS (attention-based) RNN decoder.

Reference: ``RNNDecoder`` ``neural_sp/models/seq2seq/decoders/las.py:50-1706``.

TPU-first redesign: the per-token Python loop (las.py:667-704) becomes an
``nn.scan`` over a single fused step module (LSTM stack + attention +
readout), with:
  * teacher forcing fully scanned (static U+1 steps over the padded batch);
  * scheduled sampling (:668) via per-step Bernoulli inside the scan;
  * attention-key projection hoisted out of the scan (computed once per
    utterance, reference's `precompute`);
  * greedy decode as the same scan fed by its own argmax (carry-passed);
  * batched beam search drives the same single-step path (see
    ``beam_search.py``), so training and decoding share one kernel.

The CTC joint head, LM fusion, and MoChA variants attach at the
Speech2Text / module level.
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import EOS, PAD
from ...ops.criterion import cross_entropy_lsm, compute_accuracy
from ...ops.masks import make_pad_mask
from ..modules.attention import AttentionMechanism
from ..modules.gmm_attention import GMMAttention
from ..utils import append_sos_eos
from ...ops.dropout import Dropout


class LASStep(nn.Module):
    """One decode step: embed -> LSTM stack -> attend -> readout."""
    vocab: int
    emb_dim: int
    n_units: int
    n_projs: int
    n_layers: int
    enc_n_units: int
    attn_type: str = "location"
    attn_dim: int = 512
    attn_n_heads: int = 1
    attn_conv_n_channels: int = 10
    attn_conv_kernel_size: int = 201
    attn_sharpening_factor: float = 1.0
    attn_sigmoid_smoothing: bool = False
    bottleneck_dim: int = 1024
    dropout: float = 0.0
    dropout_emb: float = 0.0
    dropout_att: float = 0.0
    ss_prob: float = 0.0
    zoneout: float = 0.0   # reference modules/zoneout.py via --zoneout
    # MoChA / MMA (attn_type == "mocha")
    mocha_chunk_size: int = 1
    mocha_n_heads_mono: int = 1
    mocha_n_heads_chunk: int = 1
    mocha_init_r: float = -4.0
    mocha_noise_std: float = 1.0
    mocha_no_denominator: bool = False
    mocha_eps_wait: int = -1
    mocha_stableemit_weight: float = 0.0
    mocha_1dconv: bool = False
    mocha_share_ca: bool = False
    # LM fusion in the readout (reference las.py:247-258, generate :852-881)
    lm_fusion: str = ""              # '' | cold | cold_prob | deep
    lm_n_units: int = 512
    lm_n_layers: int = 1
    lm_emb_dim: int = 512

    def setup(self):
        self.embed = nn.Embed(self.vocab, self.emb_dim)
        cells = []
        for _ in range(self.n_layers):
            cells.append(nn.OptimizedLSTMCell(self.n_units))
        self.cells = cells
        if self.lm_fusion:
            from ..lm.rnnlm import RNNLM
            self.lm = RNNLM(vocab=self.vocab, n_units=self.lm_n_units,
                            n_layers=self.lm_n_layers,
                            emb_dim=self.lm_emb_dim)
            self.w_dec_feat = nn.Dense(self.bottleneck_dim)
            self.w_lm = nn.Dense(self.bottleneck_dim)
            self.w_gate = nn.Dense(self.bottleneck_dim)
        if self.n_projs > 0:
            self.projs = [nn.Dense(self.n_projs)
                          for _ in range(self.n_layers)]
        qdim = self.n_projs if self.n_projs > 0 else self.n_units
        if self.attn_type == "cif":
            self.attn = None
        elif self.attn_type == "mocha":
            from ..modules.mocha import MoChA
            self.attn = MoChA(
                kdim=self.enc_n_units, qdim=qdim, adim=self.attn_dim,
                chunk_size=self.mocha_chunk_size,
                n_heads_mono=self.mocha_n_heads_mono,
                n_heads_chunk=self.mocha_n_heads_chunk,
                init_r=self.mocha_init_r, noise_std=self.mocha_noise_std,
                no_denominator=self.mocha_no_denominator,
                eps_wait=self.mocha_eps_wait,
                stableemit_weight=self.mocha_stableemit_weight,
                share_ca=self.mocha_share_ca,
                external_keys=True)
        elif self.attn_type == "gmm":
            self.attn = GMMAttention(kdim=self.enc_n_units, qdim=qdim,
                                     adim=self.attn_dim)
        elif self.attn_n_heads > 1:
            # reference las.py:220-226: multi-head selects
            # MultiheadAttentionMechanism and asserts atype 'add'
            assert self.attn_type == "add", \
                "attn_n_heads > 1 requires attn_type 'add'"
            from ..modules.attention import MultiheadAddAttention
            self.attn = MultiheadAddAttention(
                kdim=self.enc_n_units, qdim=qdim, adim=self.attn_dim,
                odim=self.enc_n_units, n_heads=self.attn_n_heads,
                dropout=self.dropout_att, external_kv=True)
        else:
            self.attn = AttentionMechanism(
                kdim=self.enc_n_units, qdim=qdim, adim=self.attn_dim,
                # reference 'triggered_attention' uses the additive energy
                # (attention.py:39-42)
                atype="add" if self.attn_type == "triggered"
                else self.attn_type,
                conv_out_channels=self.attn_conv_n_channels,
                conv_kernel_size=self.attn_conv_kernel_size,
                sharpening_factor=self.attn_sharpening_factor,
                sigmoid_smoothing=self.attn_sigmoid_smoothing,
                dropout=self.dropout_att)
        self.w_gen = nn.Dense(self.bottleneck_dim)
        self.output = nn.Dense(self.vocab)
        self.drop = Dropout(self.dropout)
        self.drop_emb = Dropout(self.dropout_emb)

    def __call__(self, carry, y_t, trigger_t, ctx_t, emb_gates_t, key_cache,
                 values, mask, deterministic: bool = True):
        """carry: (cell_states tuple, aw_prev [B,Tk], ctx_prev [B,D],
        prev_logits [B,V], lm_state); y_t: [B] int token ids;
        trigger_t: [B] per-step attention boundary (triggered attention /
        DeCoT — pass tmax-1 to disable); ctx_t: [B, D] externally
        integrated context, consumed when attn_type == "cif" (continuous
        integrate-and-fire precomputes all contexts, reference cif.py);
        emb_gates_t: [B, 4*n_units] hoisted embedding half of the layer-0
        LSTM gate pre-activations (``hoist_emb_gates``) — pass a [B, 0]
        array to use the in-step embedding path instead.
        Returns (new_carry, (logits_t [B,V], aw [B,Tk]))."""
        cell_states, aw_prev, ctx_prev, prev_logits, lm_state = carry
        emb_hoisted = emb_gates_t is not None and emb_gates_t.shape[-1] > 0
        y_in = y_t
        if self.ss_prob > 0 and not deterministic:
            use_ss = jax.random.bernoulli(
                self.make_rng("dropout"), self.ss_prob, y_t.shape)
            y_in = jnp.where(use_ss, jnp.argmax(prev_logits, -1), y_t)
        if emb_hoisted:
            h = None  # layer 0 consumes emb_gates_t + ctx_prev directly
        else:
            emb = self.drop_emb(self.embed(y_in),
                                deterministic=deterministic)
            h = jnp.concatenate([emb, ctx_prev], axis=-1)
        new_states = []
        douts = []
        for lth in range(self.n_layers):
            if lth == 0 and emb_hoisted:
                st, h = self._cell0_hoisted(cell_states[0], emb_gates_t,
                                            ctx_prev)
            else:
                st, h = self.cells[lth](cell_states[lth], h)
            if self.zoneout > 0:
                # classic zoneout (Krueger et al.; reference
                # modules/zoneout.py — NOTE the reference inverts the
                # probability, treating it as P(update); here zoneout is
                # P(keep old), the paper's convention): Bernoulli mask in
                # training, expectation p*old + (1-p)*new at inference so
                # eval-time state statistics match the trained regime.
                c_old, h_old = cell_states[lth]
                if deterministic:
                    p = self.zoneout
                    st = (p * c_old + (1 - p) * st[0],
                          p * h_old + (1 - p) * st[1])
                else:
                    r1, r2 = jax.random.split(self.make_rng("dropout"))
                    keep_c = jax.random.bernoulli(
                        r1, self.zoneout, st[0].shape)
                    keep_h = jax.random.bernoulli(
                        r2, self.zoneout, st[1].shape)
                    st = (jnp.where(keep_c, c_old, st[0]),
                          jnp.where(keep_h, h_old, st[1]))
                h = st[1]
            new_states.append(st)
            h = self.drop(h, deterministic=deterministic)
            if self.n_projs > 0:
                # reference uses relu on the per-layer projection
                # (las.py:840)
                h = jax.nn.relu(self.projs[lth](h))
            douts.append(h)

        query = douts[0]  # dout_score: first-layer output (reference :778)
        if self.attn_type == "cif":
            ctx, aw = ctx_t, aw_prev
            aw_new = aw_prev
        elif self.attn_type == "mocha":
            # aw_prev: [B, H_ma, Tk]; hard mode at inference (parity with the
            # reference's train/eval mode switch); trigger_t drives DeCoT
            ctx, alpha, beta = self.attn(
                key_cache, query, aw_prev,
                mode="hard" if deterministic else "parallel",
                mask=mask, trigger_points=trigger_t,
                deterministic=deterministic)
            aw_new, aw = alpha, alpha
        elif self.attn_type == "gmm":
            ctx, aw, myu = self.attn(values, values, query, mask,
                                     myu_prev=aw_prev[:, :self.attn.n_mixtures])
            aw_new = jnp.zeros_like(aw_prev).at[:, :self.attn.n_mixtures].set(myu)
        elif self.attn_n_heads > 1:
            ctx, aw = self.attn(None, values, query, mask,
                                key_cache=key_cache,
                                deterministic=deterministic)
            aw_new = aw
        else:
            trig = trigger_t if self.attn_type == "triggered" else None
            ctx, aw = self.attn(None, values, query, mask, aw_prev,
                                trigger_points=trig, key_cache=key_cache,
                                deterministic=deterministic)
            aw_new = aw
        lm_raw = None
        if self.lm_fusion:
            lm_lp, lm_state, h_lm = self.lm.predict(y_in, lm_state)
            if self.lm_fusion != "deep":  # deep fusion fine-tunes the LM
                lm_lp = jax.lax.stop_gradient(lm_lp)
                h_lm = jax.lax.stop_gradient(h_lm)
            lm_raw = (lm_lp if self.lm_fusion == "cold_prob"
                      else h_lm).astype(ctx.dtype)

        if self.hoists_readout(deterministic):
            # HOT PATH: the readout + vocab projection are the biggest
            # matmuls in the step — emit their inputs and let the caller
            # run them ONCE over all steps (MXU-batched) instead of 101
            # small sequential matmuls inside the scan (readout()).
            parts = [douts[-1], ctx] + ([lm_raw] if lm_raw is not None
                                        else [])
            out_t = jnp.concatenate(parts, axis=-1)
            new_carry = (tuple(new_states), aw_new, ctx, None, lm_state)
            return new_carry, (out_t, aw)

        logits_t = self._generate(douts[-1], ctx, lm_raw, deterministic)
        new_carry = (tuple(new_states), aw_new, ctx, logits_t, lm_state)
        return new_carry, (logits_t, aw)

    def hoists_readout(self, deterministic: bool) -> bool:
        """True when the scan emits readout INPUTS (no in-scan logits) —
        only scheduled sampling needs per-step logits in the carry.
        NSP_NO_HOIST=1 disables the hoist (compiler-workaround escape
        hatch; see ROADMAP environment notes)."""
        import os
        if os.environ.get("NSP_NO_HOIST") == "1":
            return False
        return self.ss_prob == 0 or deterministic

    def _generate(self, dout, ctx, lm_raw, deterministic: bool):
        """Readout + output head (reference generate() las.py:852-881:
        dec_feat = W([dout, cv]); lm_feat = W(h_lm) (or W(lm log-probs) for
        cold_prob); gate = sigmoid(W([dec_feat, lm_feat]));
        attn_v = tanh(W([dec_feat, gate*lm_feat])))."""
        if self.lm_fusion:
            dec_feat = self.w_dec_feat(
                jnp.concatenate([dout, ctx], axis=-1))
            lm_feat = self.w_lm(lm_raw)
            gate = jax.nn.sigmoid(self.w_gate(
                jnp.concatenate([dec_feat, lm_feat], axis=-1)))
            attn_v = jnp.tanh(self.w_gen(jnp.concatenate(
                [dec_feat, gate * lm_feat], axis=-1)))
        else:
            # readout order [dout, cv] (reference :879)
            attn_v = jnp.tanh(self.w_gen(
                jnp.concatenate([dout, ctx], axis=-1)))
        attn_v = self.drop(attn_v, deterministic=deterministic)
        return self.output(attn_v)

    def readout(self, out_t, deterministic: bool = True):
        """Batched readout over hoisted scan outputs out_t
        [..., qdim + enc_n_units (+ lm_raw)] -> logits [..., vocab]."""
        qdim = self.n_projs if self.n_projs > 0 else self.n_units
        dout = out_t[..., :qdim]
        ctx = out_t[..., qdim: qdim + self.enc_n_units]
        lm_raw = out_t[..., qdim + self.enc_n_units:] \
            if self.lm_fusion else None
        return self._generate(dout, ctx, lm_raw, deterministic)

    def _cell0_kernels(self):
        """Layer-0 LSTM kernels concatenated over the (i, f, g, o) gate
        order of flax ``OptimizedLSTMCell``, split at the embedding/context
        boundary of the concat input [emb, ctx_prev]."""
        p = self.cells[0].variables["params"]
        k_in = jnp.concatenate([p[f"i{g}"]["kernel"] for g in "ifgo"], -1)
        k_h = jnp.concatenate([p[f"h{g}"]["kernel"] for g in "ifgo"], -1)
        b_h = jnp.concatenate([p[f"h{g}"]["bias"] for g in "ifgo"], -1)
        return k_in[:self.emb_dim], k_in[self.emb_dim:], k_h, b_h

    def hoist_emb_gates(self, ys_in, deterministic: bool = True):
        """Precompute the embedding half of the layer-0 LSTM gate
        pre-activations for ALL teacher-forcing steps at once: one big
        [B*U, E] gather + one [B*U, E]x[E, 4*n_units] matmul replace a
        per-step embedding gather (pathological on TPU) and a per-step
        slice of the layer-0 input matmul inside the decode scan.
        Returns [B, U, 4*n_units]; only valid when scheduled sampling is
        off for this pass (``hoists_readout`` gating)."""
        emb = self.drop_emb(self.embed(ys_in), deterministic=deterministic)
        k_emb, _, _, _ = self._cell0_kernels()
        from flax.linen.dtypes import promote_dtype
        emb, k_emb = promote_dtype(emb, k_emb, dtype=None)
        return jnp.dot(emb, k_emb)

    def _cell0_hoisted(self, carry, emb_gates_t, ctx_prev):
        """Layer-0 LSTM step consuming hoisted embedding gate
        pre-activations (``hoist_emb_gates``): only the ctx half of the
        input matmul and the recurrent matmul run inside the scan.
        Mirrors flax ``OptimizedLSTMCell`` math (gate order i, f, g, o)."""
        c, h = carry
        _, k_ctx, k_h, b_h = self._cell0_kernels()
        from flax.linen.dtypes import promote_dtype
        ctx_prev, h, k_ctx, k_h, b_h = promote_dtype(
            ctx_prev, h, k_ctx, k_h, b_h, dtype=None)
        y = (emb_gates_t.astype(k_h.dtype) + jnp.dot(ctx_prev, k_ctx)
             + jnp.dot(h, k_h) + b_h[None])
        i, f, g, o = jnp.split(y, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        new_c = f * c.astype(g.dtype) + i * g
        new_h = o * jnp.tanh(new_c)
        return (new_c, new_h), new_h


class RNNDecoder(nn.Module):
    """Training forward + greedy decode. Beam search lives in
    ``beam_search.py`` and drives ``decode_step``."""
    vocab: int
    enc_n_units: int
    n_units: int = 1024
    n_projs: int = 0
    n_layers: int = 1
    emb_dim: int = 512
    bottleneck_dim: int = 1024
    attn_type: str = "location"
    attn_dim: int = 512
    attn_n_heads: int = 1
    attn_conv_n_channels: int = 10
    attn_conv_kernel_size: int = 201
    attn_sharpening_factor: float = 1.0
    attn_sigmoid_smoothing: bool = False
    dropout: float = 0.0
    dropout_emb: float = 0.0
    dropout_att: float = 0.0
    lsm_prob: float = 0.0
    ss_prob: float = 0.0
    backward: bool = False
    zoneout: float = 0.0
    # CIF (reference modules/cif.py: `window`, must be odd)
    cif_conv_kernel_size: int = 3
    # MoChA / MMA
    mocha_chunk_size: int = 1
    mocha_n_heads_mono: int = 1
    mocha_n_heads_chunk: int = 1
    mocha_init_r: float = -4.0
    mocha_noise_std: float = 1.0
    mocha_no_denominator: bool = False
    mocha_eps_wait: int = -1
    mocha_stableemit_weight: float = 0.0
    mocha_1dconv: bool = False
    mocha_share_ca: bool = False
    quantity_loss_weight: float = 0.0
    latency_metric: str = ""         # '' | minlt | ctc_sync | decot
    latency_loss_weight: float = 0.0
    trigger_lookahead: int = 2       # frames past the trigger point
    lm_fusion: str = ""
    lm_n_units: int = 512
    lm_n_layers: int = 1
    lm_emb_dim: int = 512

    def setup(self):
        fields = dict(
            vocab=self.vocab, emb_dim=self.emb_dim, n_units=self.n_units,
            n_projs=self.n_projs, n_layers=self.n_layers,
            enc_n_units=self.enc_n_units, attn_type=self.attn_type,
            attn_dim=self.attn_dim, attn_n_heads=self.attn_n_heads,
            attn_conv_n_channels=self.attn_conv_n_channels,
            attn_conv_kernel_size=self.attn_conv_kernel_size,
            attn_sharpening_factor=self.attn_sharpening_factor,
            attn_sigmoid_smoothing=self.attn_sigmoid_smoothing,
            bottleneck_dim=self.bottleneck_dim, dropout=self.dropout,
            dropout_emb=self.dropout_emb, dropout_att=self.dropout_att,
            ss_prob=self.ss_prob, zoneout=self.zoneout,
            mocha_chunk_size=self.mocha_chunk_size,
            mocha_n_heads_mono=self.mocha_n_heads_mono,
            mocha_n_heads_chunk=self.mocha_n_heads_chunk,
            mocha_init_r=self.mocha_init_r,
            mocha_noise_std=self.mocha_noise_std,
            mocha_no_denominator=self.mocha_no_denominator,
            mocha_eps_wait=self.mocha_eps_wait,
            mocha_stableemit_weight=self.mocha_stableemit_weight,
            mocha_1dconv=self.mocha_1dconv,
            mocha_share_ca=self.mocha_share_ca,
            lm_fusion=self.lm_fusion, lm_n_units=self.lm_n_units,
            lm_n_layers=self.lm_n_layers, lm_emb_dim=self.lm_emb_dim)
        import os
        # NSP_DEC_REMAT=1: recompute the step in the backward instead of
        # saving its internals (drops the per-step [B,T,adim] tanh-energy
        # residuals of location/add attention from HBM; the recompute is
        # one extra small matmul chain per step)
        step_cls = LASStep
        if os.environ.get("NSP_DEC_REMAT") == "1":
            step_cls = nn.remat(LASStep, static_argnums=(8,))
        self.step_scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(1, 1, 1, 1, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast),
            out_axes=1,
            # per-iteration loop overhead knob (sequential deps unchanged)
            unroll=int(os.environ.get("NSP_DEC_UNROLL", "1")),
            )(**fields, name="step")
        if self.attn_type == "cif":
            from ..modules.cif import CIF
            self.cif = CIF(enc_dim=self.enc_n_units,
                           conv_kernel_size=self.cif_conv_kernel_size)
        # attention key projection hoisted out of the scan
        if self.attn_type == "mocha":
            # biases match the reference energies: w_key has a bias
            # (monotonic_energy.py:50, chunk_energy.py additive), as does
            # w_value (mocha.py:121)
            h_ma, h_ca = self.mocha_n_heads_mono, self.mocha_n_heads_chunk
            self.key_proj_mono = nn.Dense(self.attn_dim * h_ma,
                                          use_bias=True)
            if self.mocha_chunk_size != 1:
                # shared CA: one chunk-head set broadcast over MA heads
                # (reference mocha.py:115)
                h_ck = h_ca if self.mocha_share_ca else h_ma * h_ca
                self.key_proj_chunk = nn.Dense(self.attn_dim * h_ck,
                                               use_bias=True)
            if self.mocha_1dconv:
                # relu(conv5-SAME) on the raw keys before the monotonic
                # key projection (reference monotonic_energy.py:119-120)
                self.mono_conv = nn.Conv(self.enc_n_units, (5,),
                                         padding="SAME")
            # multihead only — with H_total == 1 the context consumes raw
            # eouts (reference mocha.py:120-122, :289-292)
            if h_ma * h_ca > 1:
                self.key_proj_value = nn.Dense(self.attn_dim * h_ma * h_ca,
                                               use_bias=True)
            else:
                self.key_proj_value = None
            self.key_proj = None
        elif self.attn_type == "add" and self.attn_n_heads > 1:
            # multi-head additive: keys AND values projected once per
            # utterance (reference multihead_attention.py:121-122)
            self.key_proj = nn.Dense(self.attn_dim, use_bias=True)
            self.value_proj = nn.Dense(self.attn_dim, use_bias=True)
        elif self.attn_type in ("location", "add", "triggered"):
            # reference w_key has a bias for add/location (attention.py:41,
            # 44); 'triggered' uses the additive energy (attention.py:39-42)
            # so it projects keys the same way
            self.key_proj = nn.Dense(self.attn_dim, use_bias=True)
        elif self.attn_type == "luong_general":
            qdim = self.n_projs if self.n_projs > 0 else self.n_units
            self.key_proj = nn.Dense(qdim, use_bias=False)
        else:
            self.key_proj = None

    def _key_cache(self, eouts):
        if self.attn_type == "cif":
            return eouts
        if self.attn_type == "mocha":
            mono_in = jax.nn.relu(self.mono_conv(eouts)) \
                if self.mocha_1dconv else eouts
            kc = {"mono": self.key_proj_mono(mono_in),
                  "value": self.key_proj_value(eouts)
                  if self.key_proj_value is not None else eouts}
            if self.mocha_chunk_size != 1:
                kc["chunk"] = self.key_proj_chunk(eouts)
            return kc
        if self.attn_type == "add" and self.attn_n_heads > 1:
            return {"k": self.key_proj(eouts), "v": self.value_proj(eouts)}
        return self.key_proj(eouts) if self.key_proj is not None else eouts

    def init_carry(self, bs: int, tmax: int, dtype=jnp.float32,
                   need_logits: bool | None = None):
        """``need_logits``: carry per-step logits (scheduled sampling, or
        the NSP_NO_HOIST escape hatch — see ``LASStep.hoists_readout``).
        Default (None) resolves from the deterministic/decode-time flag."""
        if need_logits is None:
            # decode-time resolution without bound submodule access
            import os
            need_logits = os.environ.get("NSP_NO_HOIST") == "1"
        states = tuple(
            (jnp.zeros((bs, self.n_units), dtype),
             jnp.zeros((bs, self.n_units), dtype))
            for _ in range(self.n_layers))
        if self.attn_type == "mocha":
            aw0 = jnp.zeros((bs, self.mocha_n_heads_mono, tmax),
                            dtype).at[:, :, 0].set(1.0)
        else:
            aw0 = jnp.zeros((bs, tmax), dtype)
        ctx0 = jnp.zeros((bs, self.enc_n_units), dtype)
        logits0 = jnp.zeros((bs, self.vocab), dtype) if need_logits else None
        lm_state0 = [
            (jnp.zeros((bs, self.lm_n_units), dtype),
             jnp.zeros((bs, self.lm_n_units), dtype))
            for _ in range(self.lm_n_layers)] if self.lm_fusion else None
        return (states, aw0, ctx0, logits0, lm_state0)

    def __call__(self, eouts, elens, ys, ylens, deterministic: bool = True,
                 trigger_points=None, return_logits: bool = False,
                 teacher_probs=None, distillation_weight: float = 0.0):
        """Teacher-forced XE loss (+ accuracy); ys: [B, U] PAD-padded.
        teacher_probs: [B, U+1, V] soft targets for distillation
        (reference las.py:771-774, criterion distillation)."""
        bs, tmax, _ = eouts.shape
        ys_in, ys_out, _ = append_sos_eos(ys, ylens, bwd=self.backward)
        mask = make_pad_mask(elens, tmax)
        key_cache = self._key_cache(eouts)
        hoisted = self.step_scan.hoists_readout(deterministic)
        carry = self.init_carry(bs, tmax, eouts.dtype,
                                need_logits=not hoisted)
        if trigger_points is not None and (
                self.attn_type == "triggered" or
                (self.attn_type == "mocha" and self.latency_metric == "decot")):
            # per-step boundary (+ lookahead margin, reference :165-169)
            u1 = ys_in.shape[1]
            trig = jnp.pad(trigger_points.astype(jnp.int32),
                           ((0, 0), (0, max(u1 - trigger_points.shape[1], 0))),
                           constant_values=tmax - 1)[:, :u1]
            trig = jnp.minimum(trig + self.trigger_lookahead, tmax - 1)
        else:
            trig = jnp.full((bs, ys_in.shape[1]), tmax - 1, jnp.int32)
        obs_extra = {}
        if self.attn_type == "cif":
            # scaled firing: alphas renormalised so each utterance fires
            # exactly ylen(+1) times (reference cif.py 'resize' mode)
            cv, _, _, _ = self.cif(eouts, elens, ylens + 1,
                                   deterministic=deterministic)
            u1 = ys_in.shape[1]
            ctx_steps = jnp.pad(
                cv[:, :u1], ((0, 0), (0, max(u1 - cv.shape[1], 0)), (0, 0)))
            if self.quantity_loss_weight > 0 and not deterministic:
                # quantity loss on the UNSCALED alphas — the scaled sum is
                # ylen+1 by construction, which would zero the loss; the
                # regulariser must pull the raw firing count toward ylen+1
                # (reference cif quantity semantics)
                _, alpha_raw, _, _ = self.cif(
                    eouts, elens, None, deterministic=deterministic)
                qty = jnp.abs(jnp.sum(alpha_raw, axis=1)
                              - (ylens + 1).astype(jnp.float32))
                obs_extra["loss_quantity"] = jnp.mean(qty)
        else:
            ctx_steps = jnp.zeros(
                (bs, ys_in.shape[1], self.enc_n_units), eouts.dtype)
        if hoisted and not self.is_initializing():
            emb_gates = self.step_scan.hoist_emb_gates(ys_in, deterministic)
        else:
            emb_gates = jnp.zeros((bs, ys_in.shape[1], 0), eouts.dtype)
        # NOTE (round 4): a fused Pallas decoder-scan kernel (LSTM +
        # location attention in one launch, weights VMEM-resident across
        # all steps) was built, gradient-verified in interpret mode, and
        # measured on a real v5e — and DELETED: at the flagship shape
        # (1024-unit LSTM) the weight set alone is 12 MB bf16 and the
        # backward's scoped-VMEM demand was 21.55 MB against the chip's
        # 16 MB VMEM, so the weights-stay-resident premise cannot hold on
        # this hardware generation (git history `las_scan_pallas.py` for
        # the kernel; ROADMAP.md round-4 notes for the measurement).
        carry, (outs, aws) = self.step_scan(
            carry, ys_in, trig, ctx_steps, emb_gates, key_cache, eouts,
            mask, deterministic)
        # hoisted readout: ONE batched matmul pair over all steps
        logits = self.step_scan.readout(outs, deterministic) if hoisted \
            else outs
        loss, nll = cross_entropy_lsm(logits, ys_out, self.lsm_prob,
                                      ignore_index=PAD)
        if "loss_quantity" in obs_extra:
            loss = loss + self.quantity_loss_weight * \
                obs_extra["loss_quantity"]
        if teacher_probs is not None and distillation_weight > 0:
            from ...ops.criterion import distillation
            loss_kd = distillation(logits, teacher_probs, ys_out,
                                   ignore_index=PAD)
            loss = (1.0 - distillation_weight) * loss + \
                distillation_weight * loss_kd
        acc = compute_accuracy(logits, ys_out, ignore_index=PAD)
        obs = {"loss_att": loss, "acc_att": acc, "ppl_att": jnp.exp(nll)}
        obs.update(obs_extra)

        if self.attn_type == "mocha" and not deterministic:
            # aws: [B, U+1, H, T] expected alignments
            u_idx = jnp.arange(aws.shape[1])[None]
            valid = (u_idx < ylens[:, None] + 1).astype(jnp.float32)
            alpha_mass = jnp.sum(aws.astype(jnp.float32),
                                 axis=(2, 3)) / aws.shape[2]  # [B, U+1]
            if self.quantity_loss_weight > 0:
                # |sum of alignment mass - #tokens| (reference las.py:736-742)
                qty = jnp.abs(jnp.sum(alpha_mass * valid, axis=1)
                              - (ylens + 1).astype(jnp.float32))
                loss_qty = jnp.mean(qty)
                loss = loss + self.quantity_loss_weight * loss_qty
                obs["loss_quantity"] = loss_qty
            if self.latency_metric in ("minlt", "ctc_sync") and \
                    self.latency_loss_weight > 0 and trigger_points is not None:
                # expected boundary per step vs forced-alignment triggers
                t_idx = jnp.arange(eouts.shape[1])[None, None, None]
                exp_bd = jnp.sum(
                    aws.astype(jnp.float32) * t_idx, axis=3).mean(2)  # [B,U+1]
                tp = trigger_points.astype(jnp.float32)
                u_tok = jnp.arange(aws.shape[1])[None]
                valid_tok = (u_tok < ylens[:, None]).astype(jnp.float32)
                tp_pad = jnp.pad(tp, ((0, 0),
                                      (0, max(aws.shape[1] - tp.shape[1], 0))))
                tp_pad = tp_pad[:, :aws.shape[1]]
                # -1 rows mark utterances without an alignment (collate
                # sentinel) — excluded from the latency loss
                valid_tok = valid_tok * (tp_pad >= 0).astype(jnp.float32)
                lat = jnp.abs(exp_bd - tp_pad) * valid_tok
                loss_lat = jnp.sum(lat) / jnp.maximum(jnp.sum(valid_tok), 1.0)
                loss = loss + self.latency_loss_weight * loss_lat
                obs["loss_latency"] = loss_lat
        if return_logits:
            obs["logits"] = logits
            obs["aws"] = aws
        return loss, obs

    def forward_mbr(self, eouts, elens, nbest_ys, nbest_ylens, risks,
                    scale: float = 1.0):
        """Minimum-Bayes-risk loss over an n-best list (reference
        ``forward_mbr`` las.py:507-616 + the MBR autograd Function
        criterion.py:15-42 — here the expected risk is directly
        differentiable through softmax-normalised sequence scores).

        nbest_ys: [B, N, U]; nbest_ylens: [B, N]; risks: [B, N] (e.g. WER).
        """
        bs, n, u = nbest_ys.shape
        e_flat = jnp.repeat(eouts, n, axis=0)
        el_flat = jnp.repeat(elens, n, axis=0)
        lp = self.sequence_log_prob(
            e_flat, el_flat, nbest_ys.reshape(bs * n, u),
            nbest_ylens.reshape(bs * n)).reshape(bs, n)
        p_hat = jax.nn.softmax(scale * lp, axis=1)
        loss = jnp.mean(jnp.sum(p_hat * risks, axis=1))
        return loss

    def sequence_log_prob(self, eouts, elens, ys, ylens):
        """Teacher-forced sum log-prob per utterance [B] (fwd-bwd merging /
        MBR / rescoring; reference fwd_bwd_attention.py:12-108)."""
        bs, tmax, _ = eouts.shape
        ys_in, ys_out, _ = append_sos_eos(ys, ylens, bwd=self.backward)
        mask = make_pad_mask(elens, tmax)
        key_cache = self._key_cache(eouts)
        carry = self.init_carry(bs, tmax, eouts.dtype)
        trig = jnp.full((bs, ys_in.shape[1]), tmax - 1, jnp.int32)
        if self.attn_type == "cif":
            cv, _, _, _ = self.cif(eouts, elens, ylens + 1)
            u1 = ys_in.shape[1]
            ctx_steps = jnp.pad(
                cv[:, :u1], ((0, 0), (0, max(u1 - cv.shape[1], 0)), (0, 0)))
        else:
            ctx_steps = jnp.zeros(
                (bs, ys_in.shape[1], self.enc_n_units), eouts.dtype)
        if self.step_scan.hoists_readout(True) and not self.is_initializing():
            emb_gates = self.step_scan.hoist_emb_gates(ys_in, True)
        else:
            emb_gates = jnp.zeros((bs, ys_in.shape[1], 0), eouts.dtype)
        _, (outs, _) = self.step_scan(
            carry, ys_in, trig, ctx_steps, emb_gates, key_cache, eouts,
            mask, True)
        logits = self.step_scan.readout(outs, True) \
            if self.step_scan.hoists_readout(True) else outs
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tok_lp = jnp.take_along_axis(
            lp, jnp.maximum(ys_out, 0)[..., None], axis=-1)[..., 0]
        valid = (ys_out != PAD)
        return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1)

    def decode_step(self, carry, y_t, key_cache, eouts, mask):
        """Single decode step (beam search / streaming); same params as the
        training scan (scan over one step)."""
        trig = jnp.full((y_t.shape[0], 1), eouts.shape[1] - 1, jnp.int32)
        ctx0 = jnp.zeros((y_t.shape[0], 1, self.enc_n_units), eouts.dtype)
        eg0 = jnp.zeros((y_t.shape[0], 1, 0), eouts.dtype)
        carry, (outs, aws) = self.step_scan(
            carry, y_t[:, None], trig, ctx0, eg0, key_cache, eouts, mask,
            True)
        logits = self.step_scan.readout(outs, True) \
            if self.step_scan.hoists_readout(True) else outs
        return carry, logits[:, 0], aws[:, 0]

    def decode_step_cif(self, carry, y_t, ctx_t, eouts, mask):
        """Single decode step driven by an externally-fired CIF context
        (block-synchronous streaming: the reference incremental mode,
        cif.py:95-146, fires integrate-and-fire contexts one at a time;
        each fired context advances the decoder by one step)."""
        trig = jnp.full((y_t.shape[0], 1), eouts.shape[1] - 1, jnp.int32)
        eg0 = jnp.zeros((y_t.shape[0], 1, 0), eouts.dtype)
        carry, (outs, _) = self.step_scan(
            carry, y_t[:, None], trig, ctx_t[:, None], eg0, eouts, eouts,
            mask, True)
        logits = self.step_scan.readout(outs, True) \
            if self.step_scan.hoists_readout(True) else outs
        return carry, logits[:, 0]

    def precompute_keys(self, eouts):
        return self._key_cache(eouts)

    def greedy_scan(self, eouts, elens, max_len: int):
        """Device-side greedy decode as one fused scan (self-fed argmax).

        Returns (tokens [B, max_len] with PAD after eos, lens [B]).
        """
        bs, tmax, _ = eouts.shape
        mask = make_pad_mask(elens, tmax)
        key_cache = self._key_cache(eouts)
        carry0 = self.init_carry(bs, tmax, eouts.dtype)
        y0 = jnp.full((bs,), EOS, jnp.int32)
        done0 = jnp.zeros((bs,), bool)

        # feed the scan with dummy teacher tokens; override the embedding
        # input each step via the carried argmax by running step-by-step
        # inside one nn.scan: y_t input = previous argmax carried in logits.
        dummy = jnp.zeros((bs, max_len), jnp.int32)
        if self.attn_type == "cif":
            # inference firing: UNscaled alphas, contexts consumed in order
            cv, _, _, n_tok = self.cif(eouts, elens)
            ctx_in = cv[:, :max_len]
            ctx_in = jnp.pad(
                ctx_in, ((0, 0), (0, max_len - ctx_in.shape[1]), (0, 0)))
        else:
            ctx_in = jnp.zeros((bs, max_len, self.enc_n_units), eouts.dtype)

        def scan_body(mdl, carry, xs_t):
            y_dummy, ctx_t = xs_t
            step_carry, y_prev, done = carry
            trig = jnp.full((y_prev.shape[0], 1), tmax - 1, jnp.int32)
            eg0 = jnp.zeros((y_prev.shape[0], 1, 0), eouts.dtype)
            step_carry, (outs, _) = mdl(
                step_carry, y_prev[:, None], trig, ctx_t[:, None], eg0,
                key_cache, eouts, mask, True)
            logits = (mdl.readout(outs, True)
                      if mdl.hoists_readout(True) else outs)[:, 0]
            y = jnp.argmax(logits, -1).astype(jnp.int32)
            y = jnp.where(done, PAD, y)
            done = done | (y == EOS)
            return (step_carry, jnp.where(done, EOS, y), done), y

        scanned = nn.scan(
            scan_body, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1)
        (_, _, _), toks = scanned(self.step_scan, (carry0, y0, done0),
                                  (dummy, ctx_in))
        lens = jnp.argmax(
            jnp.concatenate([toks == EOS, jnp.ones((bs, 1), bool)], 1),
            axis=1)
        return toks, lens.astype(jnp.int32)


def graft_lm_params(s2t_params, lm_params, dec_key: str = "dec_fwd"):
    """Copy pretrained RNNLM params into the decoder's fusion LM
    (reference loads + freezes an external LM for cold fusion).

    Returns a new params tree; freeze with ``lm_fusion_freeze_mask``.
    """
    import copy
    out = jax.tree.map(lambda x: x, s2t_params)  # shallow-ish copy
    step = out[dec_key]["step"]
    assert "lm" in step, "decoder has no fusion LM (set lm_fusion)"
    step = dict(step)
    step["lm"] = lm_params
    d = dict(out[dec_key])
    d["step"] = step
    out = dict(out)
    out[dec_key] = d
    return out


def lm_fusion_freeze_mask(s2t_params, dec_key: str = "dec_fwd"):
    """optax mask pytree: False (frozen) for the fusion LM subtree."""
    def mark(path_has_lm, tree):
        return jax.tree.map(lambda _: not path_has_lm, tree)

    out = {}
    for k, v in s2t_params.items():
        if k != dec_key:
            out[k] = mark(False, v)
            continue
        sub = {}
        for k2, v2 in v.items():
            if k2 != "step":
                sub[k2] = mark(False, v2)
                continue
            step = {}
            for k3, v3 in v2.items():
                step[k3] = mark(k3 == "lm", v3)
            sub[k2] = step
        out[k] = sub
    return out
