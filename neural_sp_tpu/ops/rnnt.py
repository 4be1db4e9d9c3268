"""RNN-Transducer lattice loss as a TPU-native log-space scan.

Replaces the reference's external native kernels warp_rnnt (GPU) /
warprnnt_pytorch (CPU), wired at
``neural_sp/models/seq2seq/decoders/rnn_transducer.py:244-258``.

Design: alpha over the (T, U+1) lattice.
  alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                          alpha[t, u-1] + emit[t, u-1])
The t-dependence is a ``lax.scan``; the u-dependence inside each time step is
a first-order linear recurrence in the log semiring
  a[u] = logaddexp(c[u], a[u-1] + g[u])
solved with ``lax.associative_scan`` (O(log U) depth, fully vectorized on the
VPU — no per-cell Python loops, no anti-diagonal gather/scatter).
Frames past each utterance's length freeze the carry so one static (T, U)
compilation serves the whole bucket.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1.0e30


def _log_linear_scan(g: jnp.ndarray, c: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Solve a[u] = logaddexp(c[u], a[u-1] + g[u]) with a[-1] = -inf.

    g, c: [..., U]. Returns a: [..., U].
    Combine rule for elements (g1,c1) then (g2,c2):
      (g1+g2, logaddexp(c2, c1+g2)).
    """

    def combine(x, y):
        gx, cx = x
        gy, cy = y
        return (gx + gy, jnp.logaddexp(cy, cx + gy))

    _, a = lax.associative_scan(combine, (g, c), axis=axis)
    return a


@partial(jax.jit, static_argnames=("blank",))
def rnnt_alphas(log_probs, labels, logit_lengths, label_lengths, blank=0):
    """Forward (alpha) pass over the transducer lattice.

    Args:
      log_probs: [B, T, U+1, V] joint-network log-softmax outputs.
      labels: [B, U] int32.
      logit_lengths: [B], label_lengths: [B].
    Returns:
      (neg log-likelihood [B], final alpha row [B, U+1])
    """
    log_probs = log_probs.astype(jnp.float32)
    bs, tmax, u1, _ = log_probs.shape
    u = u1 - 1

    blank_lp = log_probs[..., blank]  # [B, T, U+1]
    emit_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :], labels[:, None, :, None].astype(jnp.int32), axis=3
    )[..., 0]  # [B, T, U]
    # forbid emitting past each utterance's label length
    u_ids = jnp.arange(u, dtype=jnp.int32)[None, None, :]
    emit_lp = jnp.where(u_ids < label_lengths[:, None, None], emit_lp, NEG_INF)

    # t = 0 row: alpha[0, 0] = 0; alpha[0, u] = sum_{k<u} emit[0, k]
    c0 = jnp.full((bs, u1), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    g0 = jnp.concatenate(
        [jnp.zeros((bs, 1), jnp.float32), emit_lp[:, 0, :]], axis=1)
    alpha0 = _log_linear_scan(g0, c0)

    def step(alpha_prev, xt):
        t, blank_t_1, emit_t = xt  # blank at t-1, emit at t
        base = alpha_prev + blank_t_1  # [B, U+1]
        g = jnp.concatenate(
            [jnp.zeros((bs, 1), jnp.float32), emit_t], axis=1)
        alpha_t = _log_linear_scan(g, base)  # a[0] = base[0] (blank-only entry)
        alpha_t = jnp.maximum(alpha_t, NEG_INF)
        valid = (t < logit_lengths)[:, None]
        return jnp.where(valid, alpha_t, alpha_prev), None

    ts = jnp.arange(1, tmax, dtype=jnp.int32)
    alpha_last, _ = lax.scan(
        step, alpha0,
        (ts, jnp.swapaxes(blank_lp[:, :-1], 0, 1),
         jnp.swapaxes(emit_lp[:, 1:], 0, 1)))

    final_blank = jnp.take_along_axis(
        blank_lp[jnp.arange(bs), jnp.maximum(logit_lengths - 1, 0)],
        label_lengths[:, None].astype(jnp.int32), axis=1)[:, 0]
    a_final = jnp.take_along_axis(
        alpha_last, label_lengths[:, None].astype(jnp.int32), axis=1)[:, 0]
    nll = -(a_final + final_blank)
    return nll, alpha_last


def rnnt_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "sum_over_batch",
) -> jnp.ndarray:
    """Transducer negative log-likelihood (matches warp_rnnt semantics)."""
    nll, _ = rnnt_alphas(
        log_probs, labels, logit_lengths, label_lengths, blank=blank)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return jnp.mean(nll)
    return jnp.sum(nll) / log_probs.shape[0]


@jax.jit
def rnnt_alphas_from_pair(blank_lp, emit_lp, logit_lengths, label_lengths):
    """Alpha pass from pre-gathered (blank, emit) log-probs.

    blank_lp: [B, T, U+1]; emit_lp: [B, T, U] (already -inf past ylen).
    The full [B, T, U+1, V] log-softmax is never formed — the memory-heavy
    part of warp_rnnt-style losses (SURVEY.md §2.11).
    """
    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    bs, tmax, u1 = blank_lp.shape

    c0 = jnp.full((bs, u1), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    g0 = jnp.concatenate(
        [jnp.zeros((bs, 1), jnp.float32), emit_lp[:, 0, :]], axis=1)
    alpha0 = _log_linear_scan(g0, c0)

    def step(alpha_prev, xt):
        t, blank_t_1, emit_t = xt
        base = alpha_prev + blank_t_1
        g = jnp.concatenate(
            [jnp.zeros((bs, 1), jnp.float32), emit_t], axis=1)
        alpha_t = jnp.maximum(_log_linear_scan(g, base), NEG_INF)
        valid = (t < logit_lengths)[:, None]
        return jnp.where(valid, alpha_t, alpha_prev), None

    ts = jnp.arange(1, tmax, dtype=jnp.int32)
    alpha_last, _ = lax.scan(
        step, alpha0,
        (ts, jnp.swapaxes(blank_lp[:, :-1], 0, 1),
         jnp.swapaxes(emit_lp[:, 1:], 0, 1)))
    final_blank = jnp.take_along_axis(
        blank_lp[jnp.arange(bs), jnp.maximum(logit_lengths - 1, 0)],
        label_lengths[:, None].astype(jnp.int32), axis=1)[:, 0]
    a_final = jnp.take_along_axis(
        alpha_last, label_lengths[:, None].astype(jnp.int32), axis=1)[:, 0]
    return -(a_final + final_blank)


def rnnt_loss_from_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "sum_over_batch",
) -> jnp.ndarray:
    """Transducer loss straight from joint-network logits [B, T, U+1, V].

    Forward materialises only [B, T, U+1] tensors (logsumexp + two gathers)
    instead of the [B, T, U+1, V] log-softmax; the [B,T,U+1,V]-sized
    gradient is produced by autodiff in the backward only.
    """
    logits = logits.astype(jnp.float32)
    u = labels.shape[1]
    lse = jax.nn.logsumexp(logits, axis=-1)                 # [B, T, U+1]
    blank_lp = logits[..., blank] - lse
    emit_raw = jnp.take_along_axis(
        logits[:, :, :u, :], labels[:, None, :, None].astype(jnp.int32),
        axis=3)[..., 0]
    emit_lp = emit_raw - lse[:, :, :u]
    u_ids = jnp.arange(u, dtype=jnp.int32)[None, None, :]
    emit_lp = jnp.where(u_ids < label_lengths[:, None, None], emit_lp,
                        NEG_INF)
    nll = rnnt_alphas_from_pair(blank_lp, emit_lp, logit_lengths,
                                label_lengths)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return jnp.mean(nll)
    return jnp.sum(nll) / logits.shape[0]
