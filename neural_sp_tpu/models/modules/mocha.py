"""MoChA / monotonic (multihead) chunkwise attention.

Reference package ``neural_sp/models/modules/mocha/``:
  * monotonic_energy.py:18-156 (w/ offset-r bias + weight-norm v)
  * chunk_energy.py:15-125
  * hma_train.py:12-67  — parallel (closed-form) monotonic alpha recurrence
  * mocha_train.py:14-87 — soft chunkwise beta via the moving-sum trick
  * hma_test.py:12-67   — hard threshold decoding + MMA eps_wait head sync
  * mocha_test.py:14-57 — hard chunkwise softmax window
  * mocha.py:25-311     — orchestrator (quantity loss inputs, StableEmit,
                          DeCoT masking)

TPU-first: the alpha recurrence is already closed-form (safe-cumprod /
cumsum — pure VPU ops); hard decoding is a masked argmax over eligibility
instead of a frame loop, so the same code runs under jit/vmap for
block-synchronous streaming.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.masks import apply_mask_logits

EPS = 1e-10


def safe_cumprod(x, axis=-1):
    """exp(cumsum(log(clamp(x)))) — reference hma_train safe_cumprod."""
    return jnp.exp(jnp.cumsum(jnp.log(jnp.clip(x, EPS, 1.0)), axis=axis))


def exclusive_cumprod(x, axis=-1):
    """cumprod shifted right by one: [1, x0, x0x1, ...]."""
    cp = safe_cumprod(x, axis)
    ones_shape = list(x.shape)
    ones_shape[axis] = 1
    return jnp.concatenate(
        [jnp.ones(ones_shape, x.dtype),
         jnp.take(cp, jnp.arange(x.shape[axis] - 1), axis=axis)], axis=axis)


def moving_sum(x, back: int, forward: int):
    """moving_sum over last axis: y[t] = sum_{j=t-back}^{t+forward} x[j]
    (reference mocha_train moving_sum conv trick)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(back, forward)]
    xp = jnp.pad(x, pad)
    cs = jnp.cumsum(xp, axis=-1)
    cs = jnp.concatenate(
        [jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    t = x.shape[-1]
    idx_hi = jnp.arange(t) + back + forward + 1
    idx_lo = jnp.arange(t)
    return jnp.take(cs, idx_hi, axis=-1) - jnp.take(cs, idx_lo, axis=-1)


def parallel_monotonic_attention(p_choose, alpha_prev):
    """Closed-form expected alignment for one decoder step
    (reference hma_train.py:40-66).

    p_choose, alpha_prev: [B, H, T] -> alpha: [B, H, T]
    alpha[t] = p[t] * cumprod_{<t}(1-p) * cumsum(alpha_prev[t]/cumprod_{<t}(1-p))
    """
    cp = jnp.clip(exclusive_cumprod(1.0 - p_choose), EPS, 1.0)
    alpha = p_choose * cp * jnp.cumsum(alpha_prev / cp, axis=-1)
    return jnp.clip(alpha, 0.0, 1.0)


def soft_chunkwise_attention(alpha, chunk_energy, chunk_size: int):
    """beta[t] = sum_{k=t}^{t+w-1} alpha[k] * exp(u[t]) / movsum(exp(u))[k]
    (reference mocha_train.py:14-87). chunk_size -1 = full lookback."""
    u = chunk_energy - jnp.max(chunk_energy, axis=-1, keepdims=True)
    exp_u = jnp.exp(u)
    if chunk_size < 0:
        denom = jnp.cumsum(exp_u, axis=-1)
        # beta[t] = exp_u[t] * sum_{k>=t} alpha[k] / denom[k]
        ratio = alpha / jnp.clip(denom, EPS, None)
        rev_cum = jnp.cumsum(ratio[..., ::-1], axis=-1)[..., ::-1]
        return exp_u * rev_cum
    denom = moving_sum(exp_u, back=chunk_size - 1, forward=0)
    beta = exp_u * moving_sum(
        alpha / jnp.clip(denom, EPS, None), back=0, forward=chunk_size - 1)
    return beta


def hard_monotonic_attention(e_mono, alpha_prev, eps_wait: int = -1):
    """Hard boundary selection at test time (reference hma_test.py:12-67).

    e_mono: [B, H, T] monotonic energies; alpha_prev: [B, H, T] one-hot
    previous boundary (all-zero = start). Returns one-hot alpha [B, H, T]
    (all-zero when no boundary fires). eps_wait >= 0 enforces MMA head
    synchronization: heads may not run more than eps_wait frames past the
    slowest head's boundary.
    """
    bs, h, t = e_mono.shape
    p = jax.nn.sigmoid(e_mono) >= 0.5
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (bs, h, t), 2)
    has_prev = jnp.sum(alpha_prev, axis=-1) > 0            # [B, H]
    t_prev = jnp.argmax(alpha_prev, axis=-1)               # [B, H]
    start = jnp.where(has_prev, t_prev, 0)
    eligible = t_idx >= start[..., None]
    fire = p & eligible
    any_fire = jnp.any(fire, axis=-1)                      # [B, H]
    t_new = jnp.argmax(fire, axis=-1)                      # [B, H]
    if eps_wait >= 0:
        # clamp every head's boundary to slowest-firing head + eps_wait
        t_eff = jnp.where(any_fire, t_new, t - 1)
        slowest = jnp.min(t_eff, axis=1, keepdims=True)    # [B, 1]
        t_new = jnp.minimum(t_new, slowest + eps_wait)
        any_fire = any_fire | jnp.any(any_fire, axis=1, keepdims=True)
    alpha = jax.nn.one_hot(t_new, t, dtype=e_mono.dtype) * \
        any_fire[..., None].astype(e_mono.dtype)
    return alpha


def hard_chunkwise_attention(alpha, chunk_energy, chunk_size: int):
    """Softmax over the [t-w+1, t] window behind each hard boundary
    (reference mocha_test.py:14-57). alpha: one-hot [B, H, T]."""
    bs, h, t = alpha.shape
    t_bd = jnp.argmax(alpha, axis=-1)                      # [B, H]
    fired = jnp.sum(alpha, axis=-1) > 0
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (bs, h, t), 2)
    if chunk_size < 0:
        win = t_idx <= t_bd[..., None]
    else:
        win = (t_idx <= t_bd[..., None]) & \
            (t_idx > t_bd[..., None] - chunk_size)
    e = jnp.where(win, chunk_energy, -1e30)
    beta = jax.nn.softmax(e, axis=-1)
    return beta * fired[..., None].astype(beta.dtype)


class MonotonicEnergy(nn.Module):
    """Energy for boundary prediction (reference monotonic_energy.py:93-156):
    additive ``v . relu(Wk k + bk + Wq q)`` (w_key HAS a bias, w_query does
    not — :50-52) or scaled-dot ``(q.k)/sqrt(adim)`` (both biased, :54-55),
    plus the learned offset ``r`` (init negative so early training rarely
    fires). The reference's weight-norm on v folds into the converted v."""
    kdim: int
    qdim: int
    adim: int
    n_heads: int = 1
    atype: str = "add"
    init_r: float = -4.0
    conv1d: bool = False
    external_key: bool = False   # key projection hoisted out (scan-friendly)

    def setup(self):
        if not self.external_key:
            self.w_key = nn.Dense(self.adim * self.n_heads, use_bias=True)
        self.w_query = nn.Dense(self.adim * self.n_heads,
                                use_bias=(self.atype == "scaled_dot"))
        if self.atype == "add":
            self.v = self.param(
                "v", nn.initializers.lecun_normal(),
                (self.n_heads, self.adim))
        self.r = self.param("r", lambda k: jnp.full((self.n_heads,),
                                                    self.init_r))
        if self.conv1d:
            # reference monotonic_energy.py:64-67: kernel 5, SYMMETRIC
            # padding (k-1)//2 ("lookahead is introduced"), relu, no
            # residual, applied before w_key
            self.conv = nn.Conv(self.kdim, (5,), padding="SAME")

    def precompute(self, key):
        if self.external_key:
            return key
        if self.conv1d:
            key = jax.nn.relu(self.conv(key))
        return self.w_key(key)  # [B, T, H*A]

    def __call__(self, key_cache, query):
        """key_cache: [B, T, H*A]; query: [B, qdim] -> e [B, H, T]."""
        bs, t, _ = key_cache.shape
        k = key_cache.reshape(bs, t, self.n_heads, self.adim)
        q = self.w_query(query).reshape(bs, self.n_heads, self.adim)
        if self.atype == "add":
            e = jnp.einsum("ha,btha->bht", self.v,
                           jax.nn.relu(k + q[:, None]))
        else:
            e = jnp.einsum("bha,btha->bht", q, k) / np.sqrt(self.adim)
        return e + self.r[None, :, None]


class ChunkEnergy(nn.Module):
    """Chunkwise attention energy (reference chunk_energy.py:40-125):
    additive ``v . relu(Wk k + bk + Wq q)`` or scaled-dot."""
    kdim: int
    qdim: int
    adim: int
    n_heads: int = 1
    atype: str = "add"
    external_key: bool = False

    def setup(self):
        if not self.external_key:
            self.w_key = nn.Dense(self.adim * self.n_heads, use_bias=True)
        self.w_query = nn.Dense(self.adim * self.n_heads,
                                use_bias=(self.atype == "scaled_dot"))
        if self.atype == "add":
            self.v = self.param(
                "v", nn.initializers.lecun_normal(),
                (self.n_heads, self.adim))

    def precompute(self, key):
        return key if self.external_key else self.w_key(key)

    def __call__(self, key_cache, query):
        bs, t, _ = key_cache.shape
        k = key_cache.reshape(bs, t, self.n_heads, self.adim)
        q = self.w_query(query).reshape(bs, self.n_heads, self.adim)
        if self.atype == "add":
            return jnp.einsum("ha,btha->bht", self.v,
                              jax.nn.relu(k + q[:, None]))
        return jnp.einsum("bha,btha->bht", q, k) / np.sqrt(self.adim)


class MoChA(nn.Module):
    """Orchestrator for one decoder step (reference mocha.py:25-311).

    State: alpha_prev [B, H_ma, T] (expected alignment in training, one-hot
    boundaries at test). Modes: 'parallel' (training) | 'hard' (inference).
    """
    kdim: int
    qdim: int
    adim: int
    chunk_size: int = 1               # w; 1 = hard monotonic, -1 = MoChA-inf
    n_heads_mono: int = 1             # >1 = MMA
    n_heads_chunk: int = 1
    atype: str = "add"
    init_r: float = -4.0
    noise_std: float = 1.0
    no_denominator: bool = False
    conv1d: bool = False
    eps_wait: int = -1
    decot: bool = False
    decot_delta: int = 2
    stableemit_weight: float = 0.0
    # share CA heads among MA heads (reference mocha.py:96,115 share_ca —
    # one chunk-energy head set broadcast over the monotonic heads)
    share_ca: bool = False
    external_keys: bool = False

    @property
    def n_chunk_energy_heads(self) -> int:
        return (self.n_heads_chunk if self.share_ca
                else self.n_heads_mono * self.n_heads_chunk)

    def setup(self):
        self.monotonic_energy = MonotonicEnergy(
            self.kdim, self.qdim, self.adim, self.n_heads_mono, self.atype,
            self.init_r, conv1d=self.conv1d, external_key=self.external_keys)
        if self.chunk_size != 1:
            self.chunk_energy = ChunkEnergy(
                self.kdim, self.qdim, self.adim,
                self.n_chunk_energy_heads, self.atype,
                external_key=self.external_keys)
        # reference mocha.py:120-122 — value/out projections exist only for
        # the multihead case; with H_total == 1 the context is the raw
        # value weighted by alpha/beta (:289-292)
        if self.n_heads_mono * self.n_heads_chunk > 1:
            if not self.external_keys:
                self.w_value = nn.Dense(self.adim * self.n_heads_mono *
                                        self.n_heads_chunk, use_bias=True)
            self.w_out = nn.Dense(self.kdim, use_bias=True)

    def precompute(self, key):
        out = {"mono": self.monotonic_energy.precompute(key)}
        if self.chunk_size != 1:
            out["chunk"] = self.chunk_energy.precompute(key)
        if self.n_heads_mono * self.n_heads_chunk > 1 and \
                not self.external_keys:
            out["value"] = self.w_value(key)
        else:
            out["value"] = key
        return out

    def init_alpha(self, bs: int, tmax: int, dtype=jnp.float32):
        """Training init: attend frame 0 (reference: alpha_0 = onehot(0))."""
        a = jnp.zeros((bs, self.n_heads_mono, tmax), dtype)
        return a.at[:, :, 0].set(1.0)

    def __call__(self, key_cache, query, alpha_prev, mode: str = "parallel",
                 mask=None, trigger_points=None, deterministic: bool = True):
        """Returns (ctx [B, kdim], alpha [B, H_ma, T], beta)."""
        bs, t = key_cache["mono"].shape[:2]
        h_ma, h_ca = self.n_heads_mono, self.n_heads_chunk
        e_mono = self.monotonic_energy(key_cache["mono"], query)  # [B,H,T]
        if mask is not None:
            e_mono = apply_mask_logits(e_mono, mask[:, None, :])

        if mode == "parallel":
            noise = 0.0
            if not deterministic and self.noise_std > 0:
                noise = self.noise_std * jax.random.normal(
                    self.make_rng("dropout"), e_mono.shape)
            p_choose = jax.nn.sigmoid(e_mono + noise)
            if self.no_denominator:
                alpha = p_choose * exclusive_cumprod(1 - p_choose) * \
                    jnp.cumsum(alpha_prev, axis=-1)
            else:
                alpha = parallel_monotonic_attention(p_choose, alpha_prev)
            if self.stableemit_weight > 0:
                alpha = (1 - self.stableemit_weight) * alpha
            if trigger_points is not None:
                # mask alignment beyond trigger + delta (DeCoT); callers pass
                # tmax-1 dummies to disable, so this is a no-op mask then
                t_idx = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 2)
                lim = (trigger_points + self.decot_delta)[:, None, None]
                alpha = jnp.where(t_idx <= lim, alpha, 0.0)
        else:
            alpha = hard_monotonic_attention(e_mono, alpha_prev,
                                             self.eps_wait)
            p_choose = None

        if self.chunk_size == 1:
            beta = alpha[:, :, None, :].repeat(h_ca, 2) if h_ca > 1 else \
                alpha[:, :, None, :]
        else:
            e_chunk = self.chunk_energy(key_cache["chunk"], query)
            if self.share_ca:
                e_chunk = jnp.broadcast_to(
                    e_chunk.reshape(bs, 1, h_ca, t), (bs, h_ma, h_ca, t))
            else:
                e_chunk = e_chunk.reshape(bs, h_ma, h_ca, t)
            if mask is not None:
                e_chunk = apply_mask_logits(e_chunk, mask[:, None, None, :])
            a4 = alpha[:, :, None, :]
            if mode == "parallel":
                beta = jax.vmap(
                    lambda al, en: soft_chunkwise_attention(
                        al, en, self.chunk_size),
                    in_axes=2, out_axes=2)(
                    a4.repeat(h_ca, 2), e_chunk)
            else:
                beta = jax.vmap(
                    lambda al, en: hard_chunkwise_attention(
                        al, en, self.chunk_size),
                    in_axes=2, out_axes=2)(
                    a4.repeat(h_ca, 2), e_chunk)

        # context (reference :283-292): multihead = per-head value slices
        # projected through w_out; single head = raw value weighted directly
        if h_ma * h_ca > 1:
            v = key_cache["value"].reshape(bs, t, h_ma * h_ca, self.adim)
            ctx = jnp.einsum("bit,btid->bid",
                             beta.reshape(bs, h_ma * h_ca, t), v)
            ctx = self.w_out(ctx.reshape(bs, -1))
        else:
            ctx = jnp.einsum("bt,btd->bd",
                             beta.reshape(bs, t), key_cache["value"])
        return ctx, alpha, beta


class MMAStep(nn.Module):
    """nn.scan-compatible MoChA step for Transformer-decoder MMA source
    attention (reference transformer.py:164-179): carry = alpha_prev
    [B, H_ma, T]; one query per step. Hard mode at inference, parallel in
    training (deterministic flag), matching the MoChA convention."""
    kdim: int
    qdim: int
    adim: int
    chunk_size: int = 1
    n_heads_mono: int = 1
    n_heads_chunk: int = 1
    init_r: float = -4.0
    eps_wait: int = -1
    noise_std: float = 1.0
    share_ca: bool = False

    def setup(self):
        self.mocha = MoChA(
            kdim=self.kdim, qdim=self.qdim, adim=self.adim,
            share_ca=self.share_ca,
            chunk_size=self.chunk_size, n_heads_mono=self.n_heads_mono,
            n_heads_chunk=self.n_heads_chunk, init_r=self.init_r,
            eps_wait=self.eps_wait, noise_std=self.noise_std,
            external_keys=True)

    def __call__(self, alpha_prev, query, key_cache, mask,
                 deterministic: bool = True):
        ctx, alpha, beta = self.mocha(
            key_cache, query, alpha_prev,
            mode="hard" if deterministic else "parallel",
            mask=mask, deterministic=deterministic)
        return alpha, (ctx, alpha)
