"""Relative-position self-attention as a fused Pallas TPU kernel.

TPU-native replacement for the materialized-score attention path of
``modules/relative_multihead_attention.py`` (reference semantics:
``neural_sp/models/modules/relative_multihead_attention.py:112-144`` with
``clamp_len`` > 0, the flagship conformer's pe_type 'relative').

Why a custom kernel: the flagship train step looked HBM-bandwidth-bound
(cost_analysis: 53.8 GB/step -> 65.7 ms at peak BW ~= the measured 64 ms),
and the optimized HLO materializes ~25 score-sized [B,H,T,T] tensors per
layer per step (tools/hlo_bytes.py). The stock
``jax.experimental.pallas...flash_attention`` cannot express the clamped
rel-PE term except as a materialized f32 ``ab`` bias, which measured +18
ms/step (tools/ab_flagship.py). This kernel instead rebuilds the bias
IN-KERNEL from the tiny per-query projection table ``p`` [B,H,T,R]
(R = clamp_len+1 = 11 on the flagship): scores, bias, softmax, and their
backward all live in VMEM; HBM sees only q/k/v/p/o and their grads.

MEASURED (tools/ab_flagship.py, r3): neutral on the flagship — 64.2 ms vs
64.0 ms base over 4 interleaved rounds. The [B,H,T,T] round-trips it
removes are NOT on the critical path at the flagship's post-subsample
lengths (T=375/188); cost_analysis "bytes accessed" double-counts fusion
internals. Kept as an opt-in (``NSP_PALLAS_ATTN=1``) for long-sequence
configs where score traffic dominates; parity-tested in
tests/test_rel_attention_pallas.py (interpret mode).

Semantics (bit-compatible with the module's clamped one-hot path up to
bf16 rounding):
    s[b,h,i,j] = (q.k^T)[b,h,i,j] + p[b,h,i, min(|i-j|, R-1)]
    s masked to -inf for j >= klen[b]
    aws = softmax_f32(s);  o = aws_bf16 @ v
The caller folds the 1/sqrt(dk) scale into BOTH q and p (both terms of the
reference's e = (ac+bd)/sqrt(dk) carry it).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _bias_from_p(p_h, t, r):
    """[T, R] f32 -> [T, T] f32 Toeplitz-band bias: out[i, j] =
    p_h[i, min(|i-j|, R-1)]. R fused multiply-adds on the VPU — no gather."""
    qi = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    kj = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    idx = jnp.minimum(jnp.abs(qi - kj), r - 1)
    bias = jnp.zeros((t, t), jnp.float32)
    for rr in range(r):
        bias = bias + jnp.where(idx == rr, p_h[:, rr:rr + 1], 0.0)
    return bias


def _fwd_kernel(klens_ref, q_ref, k_ref, v_ref, p_ref, o_ref, *, r):
    b = pl.program_id(0)
    _, h, t, dk = q_ref.shape
    klen = klens_ref[b]
    kj = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    kmask = kj < klen
    for hh in range(h):
        q = q_ref[0, hh]                      # [T, dk] bf16 (pre-scaled)
        kk = k_ref[0, hh]
        s = lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        s = s + _bias_from_p(p_ref[0, hh].astype(jnp.float32), t, r)
        s = jnp.where(kmask, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        aws = (e / jnp.sum(e, axis=1, keepdims=True)).astype(q.dtype)
        o_ref[0, hh] = lax.dot_general(
            aws, v_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(klens_ref, q_ref, k_ref, v_ref, p_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dp_ref, *, r):
    b = pl.program_id(0)
    _, h, t, dk = q_ref.shape
    klen = klens_ref[b]
    kj = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    kmask = kj < klen
    qi = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    idx = jnp.minimum(jnp.abs(qi - kj), r - 1)
    for hh in range(h):
        q = q_ref[0, hh]
        kk = k_ref[0, hh]
        v = v_ref[0, hh]
        do = do_ref[0, hh]
        # recompute scores + softmax in VMEM (cheaper than saving stats)
        s = lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        s = s + _bias_from_p(p_ref[0, hh].astype(jnp.float32), t, r)
        s = jnp.where(kmask, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        aws = e / jnp.sum(e, axis=1, keepdims=True)      # f32 [T, T]
        aws_lp = aws.astype(q.dtype)
        # dv[j] = sum_i aws[i,j] do[i]
        dv_ref[0, hh] = lax.dot_general(
            aws_lp, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # daws[i,j] = do[i] . v[j]
        daws = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
        ds = aws * (daws - jnp.sum(daws * aws, axis=1, keepdims=True))
        ds_lp = ds.astype(q.dtype)
        dq_ref[0, hh] = lax.dot_general(
            ds_lp, kk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, hh] = lax.dot_general(
            ds_lp, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        # dp[i, rr] = sum_j ds[i,j] [idx(i,j) == rr]
        dp = [jnp.sum(jnp.where(idx == rr, ds, 0.0), axis=1, keepdims=True)
              for rr in range(r)]
        dp_ref[0, hh] = jnp.concatenate(dp, axis=1).astype(dp_ref.dtype)


def _pad_t(x, tp):
    t = x.shape[2]
    if t == tp:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))


@partial(jax.custom_vjp, nondiff_argnums=())
def rel_attention(q, k, v, p, klens):
    """q, k, v: [B, H, T, dk] (q pre-scaled); p: [B, H, T, R] (pre-scaled);
    klens: [B] int32. Returns o [B, H, T, dk] (same dtype as q)."""
    o, _ = _rel_attention_fwd(q, k, v, p, klens)
    return o


def _interpret() -> bool:
    import os
    return os.environ.get("NSP_PALLAS_ATTN") == "interpret"


def _call(kernel, out_shapes, q, k, v, p, klens, *extra):
    bs, h, t, dk = q.shape
    r = p.shape[-1]
    tp = int(np.ceil(t / 128)) * 128
    args = [_pad_t(x, tp) for x in (q, k, v, p) + tuple(extra)]
    # index maps take (grid idx, scalar-prefetch ref) under
    # PrefetchScalarGridSpec — the klens ref is unused for indexing
    blk = lambda x: pl.BlockSpec(
        (1,) + x.shape[1:], lambda b, *_: (b, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs,),
        in_specs=[blk(x) for x in args],
        out_specs=[pl.BlockSpec((1, h, tp, s[-1]), lambda b, *_: (b, 0, 0, 0))
                   for s in out_shapes],
    )
    outs = pl.pallas_call(
        partial(kernel, r=r),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bs, h, tp, s[-1]), s[-2])
                   for s in out_shapes],
        interpret=_interpret(),
    )(klens.astype(jnp.int32), *args)
    return [o[:, :, :t] for o in outs]


def _rel_attention_fwd(q, k, v, p, klens):
    (o,) = _call(_fwd_kernel, [(q.dtype, q.shape[-1])],
                 q, k, v, p, klens)
    return o, (q, k, v, p, klens)


def _rel_attention_bwd(res, do):
    q, k, v, p, klens = res
    dk_ = q.shape[-1]
    r = p.shape[-1]
    dq, dk, dv, dp = _call(
        _bwd_kernel,
        [(q.dtype, dk_), (q.dtype, dk_), (q.dtype, dk_), (p.dtype, r)],
        q, k, v, p, klens, do)
    return dq, dk, dv, dp, None


rel_attention.defvjp(_rel_attention_fwd, _rel_attention_bwd)
