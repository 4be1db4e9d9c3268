"""Fused LAS decoder scan (LSTM + location attention) as Pallas TPU kernels.

TPU-native replacement for the teacher-forced training scan of
``models/decoders/las.py`` in its flagship configuration (reference
semantics: ``neural_sp/models/seq2seq/decoders/las.py:667-789`` — one
LSTM layer, location-aware additive attention ``attention.py:37-115``).

Why a custom kernel: with the readout/vocab matmuls and the embedding
gates hoisted out, the remaining per-step work is tiny (a [B,1536]x
[1536,4096] LSTM matmul plus attention energies over ~190 frames), but
the XLA while-loop re-reads ~13 MB of LSTM weights from HBM every step
and pays per-op dispatch for a many-op loop body, measured ~7-12 ms of
the flagship step (tools/dec_ablate.py, r3). Here the whole scan is ONE
kernel launch: the grid iterates (batch blocks, U steps) sequentially,
weights and the per-block key/value caches stay resident in VMEM across
all steps, and the LSTM carry / previous attention weights live in VMEM
scratch. The backward pass is a second kernel running the grid in
reverse with the standard LSTM/attention adjoint recurrences;
step-invariant weight gradients (LSTM kernels, readout query/conv
projections, the Toeplitz conv expansion) are reduced OUTSIDE the
kernel as single MXU-batched matmuls over the per-step adjoints the
kernel streams out.

Exact math mirrored (all validated against the XLA scan path in
tests/test_las_pallas.py, interpret mode):
    y   = eg_t + ctx_{t-1} @ Wc + h_{t-1} @ Wh + b     (gate order i,f,g,o)
    c_t = sig(y_f) c_{t-1} + sig(y_i) tanh(y_g);  h_t = sig(y_o) tanh(c_t)
    hd  = h_t * dropmask_t
    loc = toeplitz(aw_{t-1})          (SAME-pad width-K conv as matmul)
    e   = v . tanh(kc + hd Wq + loc Wf);   aw = softmax_f32(e + mask)
    ctx = aw @ values
Flagship-only by design: 1 LSTM layer, no projections/zoneout/LM-fusion,
scheduled sampling off (the hoisted-readout regime). The module falls
back to the XLA scan otherwise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def build_toeplitz(kernel: jnp.ndarray, tp: int) -> jnp.ndarray:
    """Conv kernel [K, C] -> Toeplitz expansion [C, S, Tp] with
    S = Tp + K - 1, such that for aw_pad = pad(aw, (left, K-1-left)):
    loc[b, t, c] = sum_s aw_pad[b, s] toep[c, s, t] == SAME-pad
    cross-correlation (flax nn.Conv semantics; same construction as
    modules/attention.py::_location_conv, transposed to channel-major
    for per-channel 2-D matmuls inside the kernel). One-hot contraction,
    never a gather; loop-invariant, built once per step-graph."""
    k, c = kernel.shape
    s = tp + k - 1
    si = lax.broadcasted_iota(jnp.int32, (s, tp), 0)
    ti = lax.broadcasted_iota(jnp.int32, (s, tp), 1)
    idx = si - ti                                    # tap index in [0, K)
    oh = (idx[..., None] == jnp.arange(k)[None, None]).astype(kernel.dtype)
    return jnp.einsum("stk,kc->cst", oh, kernel)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(eg_ref, kc_ref, val_ref, toep_ref, wq_ref, wf_ref, vv_ref,
                kctx_ref, kh_ref, b_ref, mask_ref, dm_ref,
                douts_ref, ctxs_ref, aws_ref, cs_ref, hpre_ref, gates_ref,
                loc_ref,
                c_s, h_s, aw_s, ctx_s, *, left: int):
    u = pl.program_id(1)
    cdt = kc_ref.dtype                               # compute (weight) dtype
    bb, tpad, adim = kc_ref.shape
    nheads_c = toep_ref.shape[0]
    hdim = kh_ref.shape[0]

    @pl.when(u == 0)
    def _init():
        c_s[...] = jnp.zeros_like(c_s)
        h_s[...] = jnp.zeros_like(h_s)
        aw_s[...] = jnp.zeros_like(aw_s)
        ctx_s[...] = jnp.zeros_like(ctx_s)

    # ---- LSTM step (f32 state, weight-dtype matmuls, i|f|g|o order) ----
    y = (eg_ref[:, 0, :].astype(jnp.float32)
         + lax.dot_general(ctx_s[...].astype(cdt), kctx_ref[...],
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
         + lax.dot_general(h_s[...].astype(cdt), kh_ref[...],
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
         + b_ref[...].astype(jnp.float32))
    yi, yf, yg, yo = (y[:, :hdim], y[:, hdim:2 * hdim],
                      y[:, 2 * hdim:3 * hdim], y[:, 3 * hdim:])
    gi = jax.nn.sigmoid(yi)
    gf = jax.nn.sigmoid(yf)
    gg = jnp.tanh(yg)
    go = jax.nn.sigmoid(yo)
    c_new = gf * c_s[...] + gi * gg
    tanh_c = jnp.tanh(c_new)
    h_new = go * tanh_c
    gates_ref[:, 0, :] = jnp.concatenate([gi, gf, gg, go],
                                         axis=-1).astype(gates_ref.dtype)
    cs_ref[:, 0, :] = c_new.astype(cs_ref.dtype)
    hpre_ref[:, 0, :] = h_new.astype(hpre_ref.dtype)
    hd = h_new * dm_ref[:, 0, :].astype(jnp.float32)

    # ---- location features from aw_{t-1} (per-channel Toeplitz matmul) ----
    aw_pad = jnp.pad(aw_s[...].astype(cdt),
                     ((0, 0), (left, toep_ref.shape[1] - tpad - left)))
    f = jnp.zeros((bb, tpad, adim), jnp.float32)
    for cc in range(nheads_c):
        loc_c = lax.dot_general(aw_pad, toep_ref[cc],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        loc_ref[:, 0, cc, :] = loc_c.astype(loc_ref.dtype)
        w_row = wf_ref[cc:cc + 1, :].astype(jnp.float32)      # [1, A]
        f = f + loc_c[:, :, None] * w_row[None]

    # ---- additive energies + masked f32 softmax + context ----
    q = lax.dot_general(hd.astype(cdt), wq_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    s = jnp.tanh(kc_ref[...].astype(jnp.float32) + q[:, None, :] + f)
    e = jnp.sum(s * vv_ref[...].astype(jnp.float32)[None], axis=-1)
    e = e + mask_ref[...].astype(jnp.float32)
    m = jnp.max(e, axis=-1, keepdims=True)
    ez = jnp.exp(e - m)
    aw = ez / jnp.sum(ez, axis=-1, keepdims=True)
    ctx = jnp.sum(aw.astype(cdt).astype(jnp.float32)[:, :, None]
                  * val_ref[...].astype(jnp.float32), axis=1)

    c_s[...] = c_new
    h_s[...] = h_new
    aw_s[...] = aw
    ctx_s[...] = ctx
    douts_ref[:, 0, :] = hd.astype(douts_ref.dtype)
    ctxs_ref[:, 0, :] = ctx.astype(ctxs_ref.dtype)
    aws_ref[:, 0, :] = aw


# ---------------------------------------------------------------------------
# backward kernel (grid reversed over steps)
# ---------------------------------------------------------------------------

def _bwd_kernel(kc_ref, val_ref, toep_ref, wq_ref, wf_ref, vv_ref,
                kctx_ref, kh_ref, mask_ref, dm_ref,
                gates_ref, cs_ref, cs_prev_ref, douts_ref, aws_ref, loc_ref,
                ddouts_ref, dctxs_ref, daws_ref,
                dy_ref, dq_ref, dloc_ref, dkc_ref, dval_ref, dvv_ref,
                dwf_ref,
                dc_s, dh_s, dctx_s, daw_s, dkc_s, dval_s, dvv_s, dwf_s,
                *, left: int):
    u = pl.program_id(1)
    nu = pl.num_programs(1)
    t_first = u == 0          # processing step U-1 (reverse order)
    t_last = u == nu - 1      # processing step 0
    cdt = kc_ref.dtype
    bb, tpad, adim = kc_ref.shape
    nheads_c = toep_ref.shape[0]
    hdim = kh_ref.shape[0]

    @pl.when(t_first)
    def _init():
        dc_s[...] = jnp.zeros_like(dc_s)
        dh_s[...] = jnp.zeros_like(dh_s)
        dctx_s[...] = jnp.zeros_like(dctx_s)
        daw_s[...] = jnp.zeros_like(daw_s)
        dkc_s[...] = jnp.zeros_like(dkc_s)
        dval_s[...] = jnp.zeros_like(dval_s)
        dvv_s[...] = jnp.zeros_like(dvv_s)
        dwf_s[...] = jnp.zeros_like(dwf_s)

    aw = aws_ref[:, 0, :]                                 # f32 stash
    hd = douts_ref[:, 0, :].astype(jnp.float32)

    # ---- attention adjoint ----
    dctx_tot = dctxs_ref[:, 0, :].astype(jnp.float32) + dctx_s[...]
    daw = (daws_ref[:, 0, :].astype(jnp.float32) + daw_s[...]
           + jnp.sum(dctx_tot[:, None, :]
                     * val_ref[...].astype(jnp.float32), axis=-1))
    dval_s[...] += aw[:, :, None] * dctx_tot[:, None, :]
    de = aw * (daw - jnp.sum(daw * aw, axis=-1, keepdims=True))
    # recompute s = tanh(kc + q + f) from stashes
    q = lax.dot_general(hd.astype(cdt), wq_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    f = jnp.zeros((bb, tpad, adim), jnp.float32)
    for cc in range(nheads_c):
        w_row = wf_ref[cc:cc + 1, :].astype(jnp.float32)      # [1, A]
        f = f + loc_ref[:, 0, cc, :].astype(jnp.float32)[:, :, None] \
            * w_row[None]
    s = jnp.tanh(kc_ref[...].astype(jnp.float32) + q[:, None, :] + f)
    des = (de[:, :, None] * s).reshape(bb * tpad, adim)
    dvv_s[...] += jnp.sum(des, axis=0, keepdims=True)
    dpre = de[:, :, None] * vv_ref[...].astype(jnp.float32)[None] \
        * (1.0 - s * s)
    dkc_s[...] += dpre
    dq = jnp.sum(dpre, axis=1)
    daw_prev = jnp.zeros((bb, tpad), jnp.float32)
    for cc in range(nheads_c):
        w_row = wf_ref[cc:cc + 1, :].astype(jnp.float32)      # [1, A]
        dloc_c = jnp.sum(dpre * w_row[None], axis=-1)
        dloc_ref[:, 0, cc, :] = dloc_c.astype(dloc_ref.dtype)
        loc_c = loc_ref[:, 0, cc, :].astype(jnp.float32)
        dwf_s[cc:cc + 1, :] += jnp.sum(
            (loc_c[:, :, None] * dpre).reshape(bb * tpad, adim),
            axis=0, keepdims=True)
        dawpad_c = lax.dot_general(dloc_c.astype(cdt), toep_ref[cc],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        daw_prev = daw_prev + dawpad_c[:, left:left + tpad]
    dquery = lax.dot_general(dq.astype(cdt), wq_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    # ---- LSTM adjoint ----
    dhd = ddouts_ref[:, 0, :].astype(jnp.float32) + dquery
    dh_pre = dhd * dm_ref[:, 0, :].astype(jnp.float32) + dh_s[...]
    g4 = gates_ref[:, 0, :].astype(jnp.float32)
    gi, gf, gg, go = (g4[:, :hdim], g4[:, hdim:2 * hdim],
                      g4[:, 2 * hdim:3 * hdim], g4[:, 3 * hdim:])
    c_t = cs_ref[:, 0, :]
    c_prev = jnp.where(t_last, 0.0, cs_prev_ref[:, 0, :])
    tanh_c = jnp.tanh(c_t)
    do_ = dh_pre * tanh_c
    dc = dc_s[...] + dh_pre * go * (1.0 - tanh_c * tanh_c)
    di = dc * gg
    dg = dc * gi
    df_ = dc * c_prev
    dy = jnp.concatenate([di * gi * (1.0 - gi), df_ * gf * (1.0 - gf),
                          dg * (1.0 - gg * gg), do_ * go * (1.0 - go)],
                         axis=-1)
    dy_ref[:, 0, :] = dy.astype(dy_ref.dtype)
    dq_ref[:, 0, :] = dq.astype(dq_ref.dtype)
    dc_s[...] = dc * gf
    dctx_s[...] = lax.dot_general(dy.astype(cdt), kctx_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dh_s[...] = lax.dot_general(dy.astype(cdt), kh_ref[...],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    daw_s[...] = daw_prev

    @pl.when(t_last)
    def _flush():
        dkc_ref[...] = dkc_s[...].astype(dkc_ref.dtype)
        dval_ref[...] = dval_s[...].astype(dval_ref.dtype)
        dvv_ref[0] = dvv_s[...].astype(dvv_ref.dtype)
        dwf_ref[0] = dwf_s[...].astype(dwf_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _interpret() -> bool:
    import os
    return os.environ.get("NSP_DEC_PALLAS") == "interpret"


def _block_b(bs: int) -> int:
    import os
    cap = int(os.environ.get("NSP_DEC_PALLAS_BB", "8"))
    bb = 1
    for cand in (2, 4, 8, 16):
        if cand <= cap and bs % cand == 0:
            bb = cand
    return bb


def _pad_t(x, tp, axis, value=0.0):
    t = x.shape[axis]
    if t == tp:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, tp - t)
    return jnp.pad(x, pads, constant_values=value)


@partial(jax.custom_vjp, nondiff_argnums=(12,))
def las_location_scan(eg, key_cache, values, toep, wq, wf, vv, kctx, kh,
                      bias, mask_add, drop_mask, left: int):
    """Fused teacher-forced LAS scan. eg: hoisted embedding gates
    [B, U, 4H]; key_cache [B, Tp, A]; values [B, Tp, D] (both ALREADY
    padded to Tp = toep.shape[2] — see ``las_scan_apply``); toep
    [C, S, Tp] (``build_toeplitz``); wq [H, A]; wf [C, A]; vv [1, A];
    kctx [D, 4H]; kh [H, 4H]; bias [1, 4H]; mask_add [B, Tp] f32
    additive (0 valid / -1e30 pad); drop_mask [B, U, H] post-LSTM
    dropout scale (ones when deterministic).
    Returns (douts [B,U,H], ctxs [B,U,D], aws [B,U,Tp] f32)."""
    outs, _ = _fwd(eg, key_cache, values, toep, wq, wf, vv, kctx, kh,
                   bias, mask_add, drop_mask, left)
    return outs


def _fwd(eg, key_cache, values, toep, wq, wf, vv, kctx, kh, bias,
         mask_add, drop_mask, left):
    bs, u, g4 = eg.shape
    tp = toep.shape[2]
    hdim = kh.shape[0]
    adim = key_cache.shape[-1]
    ddim = values.shape[-1]
    nc = toep.shape[0]
    assert key_cache.shape[1] == tp and values.shape[1] == tp, \
        "pad key_cache/values to Tp before calling (las_scan_apply)"
    kcp, valp = key_cache, values
    bb = _block_b(bs)
    nb = bs // bb
    cdt = key_cache.dtype

    const = lambda shp: pl.BlockSpec(shp, lambda b, t: (0,) * len(shp))
    per_b = lambda shp: pl.BlockSpec((bb,) + shp,
                                     lambda b, t: (b,) + (0,) * len(shp))
    per_bu = lambda shp: pl.BlockSpec(
        (bb, 1) + shp, lambda b, t: (b, t) + (0,) * len(shp))

    in_specs = [per_bu((g4,)), per_b((tp, adim)), per_b((tp, ddim)),
                const(toep.shape), const(wq.shape), const(wf.shape),
                const(vv.shape), const(kctx.shape), const(kh.shape),
                const(bias.shape), per_b((tp,)), per_bu((hdim,))]
    out_specs = [per_bu((hdim,)), per_bu((ddim,)), per_bu((tp,)),
                 per_bu((hdim,)), per_bu((hdim,)), per_bu((g4,)),
                 per_bu((nc, tp))]
    out_shape = [jax.ShapeDtypeStruct((bs, u, hdim), eg.dtype),
                 jax.ShapeDtypeStruct((bs, u, ddim), eg.dtype),
                 jax.ShapeDtypeStruct((bs, u, tp), jnp.float32),
                 jax.ShapeDtypeStruct((bs, u, hdim), jnp.float32),
                 jax.ShapeDtypeStruct((bs, u, hdim), eg.dtype),
                 jax.ShapeDtypeStruct((bs, u, g4), eg.dtype),
                 jax.ShapeDtypeStruct((bs, u, nc, tp), eg.dtype)]
    scratch = [pltpu.VMEM((bb, hdim), jnp.float32),
               pltpu.VMEM((bb, hdim), jnp.float32),
               pltpu.VMEM((bb, tp), jnp.float32),
               pltpu.VMEM((bb, ddim), jnp.float32)]
    douts, ctxs, aws, cs, hpre, gates, loc = pl.pallas_call(
        partial(_fwd_kernel, left=left),
        grid=(nb, u),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(eg, kcp, valp, toep, wq, wf, vv, kctx, kh, bias, mask_add, drop_mask)
    res = (eg, kcp, valp, toep, wq, wf, vv, kctx, kh, mask_add, drop_mask,
           aws, cs, hpre, gates, loc, douts, ctxs)
    return (douts, ctxs, aws), res


def _bwd(left, res, cts):
    (eg, kcp, valp, toep, wq, wf, vv, kctx, kh, mask_add, drop_mask,
     aws, cs, hpre, gates, loc, douts, ctxs) = res
    ddouts, dctxs, daws = cts
    bs, u, g4 = eg.shape
    tp = toep.shape[2]
    hdim = kh.shape[0]
    adim = kcp.shape[-1]
    ddim = valp.shape[-1]
    nc = toep.shape[0]
    bb = _block_b(bs)
    nb = bs // bb
    cdt = kcp.dtype

    const = lambda shp: pl.BlockSpec(shp, lambda b, t: (0,) * len(shp))
    per_b = lambda shp: pl.BlockSpec((bb,) + shp,
                                     lambda b, t: (b,) + (0,) * len(shp))
    rev = lambda b, t: (b, u - 1 - t)
    per_bu_r = lambda shp: pl.BlockSpec(
        (bb, 1) + shp, lambda b, t: rev(b, t) + (0,) * len(shp))
    per_bu_rm1 = lambda shp: pl.BlockSpec(
        (bb, 1) + shp,
        lambda b, t: (b, jnp.maximum(u - 2 - t, 0)) + (0,) * len(shp))
    per_nb = lambda shp: pl.BlockSpec((1,) + shp,
                                      lambda b, t: (b,) + (0,) * len(shp))

    in_specs = [per_b((tp, adim)), per_b((tp, ddim)), const(toep.shape),
                const(wq.shape), const(wf.shape), const(vv.shape),
                const(kctx.shape), const(kh.shape), per_b((tp,)),
                per_bu_r((hdim,)),
                per_bu_r((g4,)), per_bu_r((hdim,)), per_bu_rm1((hdim,)),
                per_bu_r((hdim,)), per_bu_r((tp,)), per_bu_r((nc, tp)),
                per_bu_r((hdim,)), per_bu_r((ddim,)), per_bu_r((tp,))]
    out_specs = [per_bu_r((g4,)), per_bu_r((adim,)), per_bu_r((nc, tp)),
                 per_b((tp, adim)), per_b((tp, ddim)),
                 per_nb((1, adim)), per_nb((nc, adim))]
    out_shape = [jax.ShapeDtypeStruct((bs, u, g4), cdt),
                 jax.ShapeDtypeStruct((bs, u, adim), cdt),
                 jax.ShapeDtypeStruct((bs, u, nc, tp), cdt),
                 jax.ShapeDtypeStruct((bs, tp, adim), jnp.float32),
                 jax.ShapeDtypeStruct((bs, tp, ddim), jnp.float32),
                 jax.ShapeDtypeStruct((nb, 1, adim), jnp.float32),
                 jax.ShapeDtypeStruct((nb, nc, adim), jnp.float32)]
    scratch = [pltpu.VMEM((bb, hdim), jnp.float32),
               pltpu.VMEM((bb, hdim), jnp.float32),
               pltpu.VMEM((bb, ddim), jnp.float32),
               pltpu.VMEM((bb, tp), jnp.float32),
               pltpu.VMEM((bb, tp, adim), jnp.float32),
               pltpu.VMEM((bb, tp, ddim), jnp.float32),
               pltpu.VMEM((1, adim), jnp.float32),
               pltpu.VMEM((nc, adim), jnp.float32)]
    dy, dq, dloc, dkc_p, dval_p, dvv_p, dwf_p = pl.pallas_call(
        partial(_bwd_kernel, left=left),
        grid=(nb, u),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(kcp, valp, toep, wq, wf, vv, kctx, kh, mask_add, drop_mask,
      gates, cs, cs, douts, aws, loc, ddouts, dctxs, daws)

    f32 = jnp.float32
    # step-invariant weight grads: one MXU-batched reduction each
    hpre_shift = jnp.concatenate(
        [jnp.zeros_like(hpre[:, :1]), hpre[:, :-1]], axis=1)
    ctx_shift = jnp.concatenate(
        [jnp.zeros_like(ctxs[:, :1]), ctxs[:, :-1]], axis=1)
    aw_shift = jnp.concatenate(
        [jnp.zeros_like(aws[:, :1]), aws[:, :-1]], axis=1)
    d_kh = jnp.einsum("buh,bug->hg", hpre_shift.astype(f32),
                      dy.astype(f32)).astype(kh.dtype)
    d_kctx = jnp.einsum("bud,bug->dg", ctx_shift.astype(f32),
                        dy.astype(f32)).astype(kctx.dtype)
    d_bias = jnp.sum(dy.astype(f32), axis=(0, 1))[None].astype(cdt)
    d_wq = jnp.einsum("buh,bua->ha", douts.astype(f32),
                      dq.astype(f32)).astype(wq.dtype)
    s_total = toep.shape[1]
    aw_pad = jnp.pad(aw_shift.astype(cdt),
                     ((0, 0), (0, 0), (left, s_total - tp - left)))
    d_toep = jnp.einsum("bus,buct->cst", aw_pad.astype(f32),
                        dloc.astype(f32)).astype(toep.dtype)
    d_eg = dy.astype(eg.dtype)
    d_kc = dkc_p.astype(kcp.dtype)
    d_val = dval_p.astype(valp.dtype)
    d_vv = jnp.sum(dvv_p, axis=0).astype(vv.dtype)
    d_wf = jnp.sum(dwf_p, axis=0).astype(wf.dtype)
    return (d_eg, d_kc, d_val, d_toep, d_wq, d_wf, d_vv, d_kctx, d_kh,
            d_bias, jnp.zeros_like(mask_add), jnp.zeros_like(drop_mask))


las_location_scan.defvjp(_fwd, _bwd)


def las_scan_apply(eg, key_cache, values, conv_kernel, wq, wf, vv, kctx,
                   kh, bias, mask, drop_mask):
    """Convenience wrapper: pads T, builds the Toeplitz expansion from the
    raw conv kernel [K, C] (differentiable), runs the fused scan, and
    un-pads. mask: [B, T] bool (True = valid). Returns (douts, ctxs,
    aws [B, U, T])."""
    t = key_cache.shape[1]
    tp = _round_up(max(t, 64), 64)
    k = conv_kernel.shape[0]
    left = (k - 1) // 2
    toep = build_toeplitz(conv_kernel, tp)
    mask_add = jnp.where(_pad_t(mask, tp, 1, value=False), 0.0, NEG) \
        .astype(jnp.float32)
    douts, ctxs, aws = las_location_scan(
        eg, _pad_t(key_cache, tp, 1), _pad_t(values, tp, 1), toep,
        wq, wf, vv, kctx, kh, bias, mask_add, drop_mask, left)
    return douts, ctxs, aws[:, :, :t]
