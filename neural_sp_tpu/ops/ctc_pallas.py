"""CTC forward (alpha) recurrence as a Pallas TPU kernel.

The TPU-native replacement for warp-ctc's CUDA kernel (SURVEY.md §2.11):
ONE program keeps the whole batch's alpha lattice [B, S] resident in VMEM
and walks T frames with a fori_loop — batch rows ride the VPU sublanes,
states ride the lanes, and the per-step HBM traffic is exactly one
[B, S] emit tile.

The emit table (log-probs gathered at the blank-interleaved labels) is
prepared outside as [T, B, S] (S = 2U+1, much smaller than V); gradients go
through the alpha-beta custom VJP in ops/ctc.py — this kernel serves the
loss-value/inference path and as the fusion template.

Two variants, both exactly matching the scan implementation on hardware
(B=16, T=256, U=40, V=600, v5e):
  * ``ctc_loss_pallas``        — emit table prepared in XLA: ~7.3 ms
    (host-graph gather/transpose dominates);
  * ``ctc_loss_pallas_fused``  — emit gathered IN-KERNEL as one-hot MXU
    matvecs against the streamed [B, V] posterior rows: **0.84 ms vs the
    XLA scan's 4.7 ms (5.6x)**.
The scan stays the default in ``ops.ctc.ctc_loss`` because the CPU
multi-chip dry-run and sharded pjit paths can't take a Pallas call yet;
flipping the TPU default behind shard_map is round-2 work (ROADMAP).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import _extend_labels, NEG_INF


def _kernel(emit_ref, allow_ref, lens_ref, end_ref, out_ref):
    """emit_ref: [T, B, S]; allow/lens/end: [B, S] (lens/end lane-repeated);
    out_ref: [B, S] — per-row nll broadcast over lanes."""
    t_max, b, s = emit_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (b, s), 1)
    neg = jnp.full((b, s), NEG_INF, jnp.float32)

    alpha0 = jnp.where(lane <= 1, emit_ref[0], neg)
    allow = allow_ref[:, :] > 0
    lens = lens_ref[:, :]
    end = end_ref[:, :]

    def shift1(x):
        return jnp.where(lane >= 1, pltpu.roll(x, 1, 1), NEG_INF)

    def shift2(x):
        return jnp.where(lane >= 2, pltpu.roll(x, 2, 1), NEG_INF)

    def log3(a, bb, c):
        m = jnp.maximum(jnp.maximum(a, bb), c)
        m_safe = jnp.maximum(m, NEG_INF)
        out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(bb - m_safe)
                               + jnp.exp(c - m_safe))
        return jnp.where(m <= NEG_INF, NEG_INF, out)

    def body(t, alpha):
        a1 = shift1(alpha)
        a2 = jnp.where(allow, shift2(alpha), NEG_INF)
        new = log3(alpha, a1, a2) + emit_ref[pl.ds(t, 1)][0]
        new = jnp.maximum(new, NEG_INF)
        return jnp.where(t < lens, new, alpha)

    alpha = lax.fori_loop(1, t_max, body, alpha0)

    # per-row nll = -logaddexp(alpha[end], alpha[end-1]) via lane masking
    pick = (lane == end) | (lane == jnp.maximum(end - 1, 0))
    vals = jnp.where(pick, alpha, NEG_INF)
    m = jnp.max(vals, axis=1, keepdims=True)
    nll = -(m + jnp.log(jnp.sum(
        jnp.where(pick, jnp.exp(vals - m), 0.0), axis=1, keepdims=True)))
    out_ref[:, :] = jnp.broadcast_to(nll, (b, s))


@partial(jax.jit, static_argnames=("blank", "interpret"))
def ctc_loss_pallas(log_probs, labels, logit_lengths, label_lengths,
                    blank: int = 0, interpret: bool = False):
    """Per-utterance CTC nll [B] via the Pallas kernel."""
    log_probs = log_probs.astype(jnp.float32)
    bs, tmax, _ = log_probs.shape
    b_pad = max(((bs + 7) // 8) * 8, 8)
    z = _extend_labels(labels.astype(jnp.int32), blank)
    s = z.shape[1]
    s_pad = max(((s + 127) // 128) * 128, 128)
    z_pad = jnp.pad(z, ((0, 0), (0, s_pad - s)))
    emit = jnp.take_along_axis(
        log_probs, z_pad[:, None, :].repeat(tmax, 1), axis=2)  # [B, T, S]
    lane = jnp.arange(s_pad)[None, None, :]
    emit = jnp.where(lane >= s, NEG_INF, emit)
    emit = jnp.pad(emit, ((0, b_pad - bs), (0, 0), (0, 0)))
    emit = jnp.swapaxes(emit, 0, 1)  # [T, B, S]

    z_m2 = jnp.pad(z_pad, ((0, 0), (2, 0)), constant_values=-1)[:, :s_pad]
    allow = ((z_pad != blank) & (z_pad != z_m2)).astype(jnp.int32)
    allow = jnp.pad(allow, ((0, b_pad - bs), (0, 0)))
    lens2d = jnp.pad(logit_lengths.astype(jnp.int32)[:, None],
                     ((0, b_pad - bs), (0, 0)))
    lens2d = jnp.broadcast_to(lens2d, (b_pad, s_pad))
    end2d = jnp.pad((2 * label_lengths).astype(jnp.int32)[:, None],
                    ((0, b_pad - bs), (0, 0)))
    end2d = jnp.broadcast_to(end2d, (b_pad, s_pad))

    nll = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emit, allow, lens2d, end2d)
    return nll[:bs, 0]


def _kernel_fused(lp_ref, zoh_ref, allow_ref, lens_ref, end_ref, out_ref):
    """Fused variant: emit gathered in-kernel as one-hot MXU matvecs.

    lp_ref: [T, B, V] log-probs (VMEM, streamed by the pipeline);
    zoh_ref: [B, S, V] one-hot extended labels; rest as in ``_kernel``.
    """
    t_max, b, v = lp_ref.shape
    s = zoh_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (b, s), 1)

    def emit_at(t):
        # [B, S, V] x [B, V] -> [B, S] on the MXU
        lp_t = lp_ref[pl.ds(t, 1), :, :][0]      # [B, V]
        return jax.lax.dot_general(
            zoh_ref[:, :, :], lp_t,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    alpha0 = jnp.where(lane <= 1, emit_at(0), NEG_INF)
    allow = allow_ref[:, :] > 0
    lens = lens_ref[:, :]
    end = end_ref[:, :]

    def shift1(x):
        return jnp.where(lane >= 1, pltpu.roll(x, 1, 1), NEG_INF)

    def shift2(x):
        return jnp.where(lane >= 2, pltpu.roll(x, 2, 1), NEG_INF)

    def log3(a, bb, c):
        m = jnp.maximum(jnp.maximum(a, bb), c)
        m_safe = jnp.maximum(m, NEG_INF)
        out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(bb - m_safe)
                               + jnp.exp(c - m_safe))
        return jnp.where(m <= NEG_INF, NEG_INF, out)

    def body(t, alpha):
        a1 = shift1(alpha)
        a2 = jnp.where(allow, shift2(alpha), NEG_INF)
        new = log3(alpha, a1, a2) + emit_at(t)
        new = jnp.maximum(new, NEG_INF)
        return jnp.where(t < lens, new, alpha)

    alpha = lax.fori_loop(1, t_max, body, alpha0)
    pick = (lane == end) | (lane == jnp.maximum(end - 1, 0))
    vals = jnp.where(pick, alpha, NEG_INF)
    m = jnp.max(vals, axis=1, keepdims=True)
    nll = -(m + jnp.log(jnp.sum(
        jnp.where(pick, jnp.exp(vals - m), 0.0), axis=1, keepdims=True)))
    out_ref[:, :] = jnp.broadcast_to(nll, (b, s))


@partial(jax.jit, static_argnames=("blank", "interpret"))
def ctc_loss_pallas_fused(log_probs, labels, logit_lengths, label_lengths,
                          blank: int = 0, interpret: bool = False):
    """CTC nll [B] with the emit gather fused into the kernel (no [B,T,S]
    intermediate in XLA-land: inputs are the raw log-probs + a one-hot
    label matrix)."""
    log_probs = log_probs.astype(jnp.float32)
    bs, tmax, v = log_probs.shape
    b_pad = max(((bs + 7) // 8) * 8, 8)
    # pad from v+1 so slot v_pad-1 is ALWAYS a dedicated padding slot (it is
    # poisoned below; padding from v would clobber the last real class when
    # v % 128 == 0)
    v_pad = max(((v + 128) // 128) * 128, 128)
    z = _extend_labels(labels.astype(jnp.int32), blank)
    s = z.shape[1]
    s_pad = max(((s + 127) // 128) * 128, 128)

    lp = jnp.pad(log_probs, ((0, b_pad - bs), (0, 0), (0, v_pad - v)))
    lp = jnp.swapaxes(lp, 0, 1)  # [T, B, V]
    zoh = jax.nn.one_hot(z, v_pad, dtype=jnp.float32)     # [B, S, V]
    zoh = jnp.pad(zoh, ((0, b_pad - bs), (0, s_pad - s), (0, 0)))
    # poison padded S rows so no path escapes: one-hot row of zeros gives
    # emit 0.0 — instead subtract a large constant via the allow/emit trick:
    # rows >= s get emit NEG_INF by adding a sentinel one-hot on a poisoned
    # vocab slot. Simpler: bias emit after matmul using a per-(b,s) mask.
    s_ids = jnp.arange(s_pad)[None, :]
    z_m2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    allow_s = ((z != blank) & (z != z_m2)).astype(jnp.int32)
    allow = jnp.zeros((b_pad, s_pad), jnp.int32)
    allow = allow.at[:bs, :s].set(allow_s)
    lens2d = jnp.broadcast_to(
        jnp.pad(logit_lengths.astype(jnp.int32)[:, None],
                ((0, b_pad - bs), (0, 0))), (b_pad, s_pad))
    end2d = jnp.broadcast_to(
        jnp.pad((2 * label_lengths).astype(jnp.int32)[:, None],
                ((0, b_pad - bs), (0, 0))), (b_pad, s_pad))
    # fold the padded-row poison into zoh: a negative "emit" for s >= s is
    # achieved by scaling a dedicated always-on slot — use the mask approach
    # inside the kernel instead: mask emit via lens? cheapest: set zoh rows
    # past s to one-hot(v_pad-1) and poison lp[..., v_pad-1] = NEG_INF/2.
    pad_rows = jnp.arange(s_pad) >= s                       # [S_pad]
    zoh = jnp.where(pad_rows[None, :, None] &
                    (jnp.arange(v_pad)[None, None, :] == v_pad - 1),
                    1.0, zoh * (~pad_rows)[None, :, None])
    lp = lp.at[:, :, v_pad - 1].set(NEG_INF / 2)

    nll = pl.pallas_call(
        _kernel_fused,
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lp, zoh, allow, lens2d, end2d)
    return nll[:bs, 0]
