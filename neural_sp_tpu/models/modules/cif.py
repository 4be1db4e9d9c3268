"""Continuous integrate-and-fire (CIF) attention (reference
``neural_sp/models/modules/cif.py:16-160``): conv -> LayerNorm -> relu ->
proj -> sigmoid alpha weights; integrate-and-fire segmentation with the
reference's boundary-frame WEIGHT SPLIT (ak1 finishes the current token,
ak2 seeds the next one, cif.py:137-146); parallel (training) mode and an
incremental (streaming) mode.

TPU-first: the parallel mode is computed without a frame loop — cumsum
boundaries locate the firings, and each frame's alpha is split between
its (at most two, since alpha <= 1 <= beta) adjacent tokens with two
segment-sum scatters. The incremental mode is a host-side numpy driver
(``CifStreamer``) for block-synchronous decoding: alphas per block come
from the jitted module, the integrate-and-fire recurrence runs on host
exactly like the reference's frame loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class CIF(nn.Module):
    enc_dim: int
    conv_kernel_size: int = 3
    threshold: float = 1.0

    @nn.compact
    def alphas(self, eouts, elens, deterministic: bool = True):
        """Firing weights [B, T]: sigmoid(proj(relu(norm(conv(e)))))
        (reference cif.py:76-79), zeroed on pad frames."""
        tmax = eouts.shape[1]
        h = nn.Conv(self.enc_dim, (self.conv_kernel_size,), padding="SAME",
                    name="conv")(eouts)
        h = nn.relu(nn.LayerNorm(name="norm")(h))
        alpha = jax.nn.sigmoid(nn.Dense(1, name="proj")(h))[..., 0]
        valid = (jnp.arange(tmax)[None] < elens[:, None])
        return jnp.where(valid, alpha, 0.0)

    def __call__(self, eouts, elens, ylens=None, deterministic: bool = True):
        """eouts: [B, T, D]; ylens: [B] (training: alphas renormalised so
        each utterance fires exactly ylen times — reference 'scaled' mode).

        Returns (cv [B, T, D] integrated contexts — row k is token k,
        alpha [B, T], token_ids [B, T] fired-token count AFTER frame t,
        n_tokens [B]).

        QUIRK MIRRORED EXACTLY (converted-weight parity,
        test_parity_reference.py::test_cif_parallel_parity): in the
        reference frame loop ``alpha_accum_prev = alpha_accum`` ALIASES
        the tensor it then updates in place (cif.py:106-107), so the
        boundary split uses the POST-update accumulator:
        ak1 = beta - (accum + a) (non-positive), ak2 = 2a + accum - beta.
        The accumulator reset is therefore data-dependent and the
        integration is inherently sequential — one lax.scan over frames
        (fine: CIF decoders are a niche path; the scan body is a handful
        of VPU ops).
        """
        bs, tmax, _ = eouts.shape
        beta = self.threshold
        alpha = self.alphas(eouts, elens, deterministic)

        if ylens is not None:
            # scale so sum(alpha) == ylen (training parity, cif.py:91)
            scale = ylens.astype(jnp.float32) / \
                jnp.maximum(alpha.sum(-1), 1e-6)
            alpha = alpha * scale[:, None]
            cap = ylens
        else:
            cap = jnp.full((bs,), tmax, jnp.int32)

        def body(carry, inp):
            accum, state, ntok = carry
            a, e, valid = inp
            # reference skips pad frames and all-fired utterances
            # (cif.py:117-123) — no accumulation at all there
            active = valid & (ntok < cap)
            a = jnp.where(active, a, 0.0)
            new_accum = accum + a
            fire = active & (new_accum >= beta)
            ak1 = beta - new_accum                 # ALIASED reference split
            ak2 = a - ak1
            cv_fire = state + ak1[:, None] * e
            state = jnp.where(fire[:, None], ak2[:, None] * e,
                              state + a[:, None] * e)
            accum = jnp.where(fire, ak2, new_accum)
            out = (fire, ntok, cv_fire)
            ntok = ntok + fire.astype(jnp.int32)
            return (accum, state, ntok), out

        accum0 = jnp.zeros((bs,), jnp.float32)
        state0 = jnp.zeros((bs, eouts.shape[-1]), jnp.float32)
        ntok0 = jnp.zeros((bs,), jnp.int32)
        valid = (jnp.arange(tmax)[None] < elens[:, None])
        (_, _, ntokT), (fires, toks, cvs) = jax.lax.scan(
            body, (accum0, state0, ntok0),
            (alpha.T, jnp.swapaxes(eouts, 0, 1).astype(jnp.float32),
             valid.T))

        # scatter each fired context into its token row
        def gather(fire_b, tok_b, cv_b):
            ids = jnp.where(fire_b, tok_b, tmax)   # non-fires -> dump row
            return jax.ops.segment_sum(cv_b, ids, num_segments=tmax + 1)

        cv = jax.vmap(gather, in_axes=(1, 1, 1))(fires, toks, cvs)[:, :tmax]
        token_ids = jnp.cumsum(fires.T.astype(jnp.int32), axis=-1)
        return cv.astype(eouts.dtype), alpha, token_ids, ntokT


class CifStreamer:
    """Incremental integrate-and-fire over streamed alpha/eouts blocks
    (single utterance — the reference incremental mode raises on bs > 1,
    cif.py:95-99). Fires ZERO OR MORE tokens per pushed block; carries
    (state, accum) across blocks. Tail handling like the reference
    (cif.py:128-133): on the final frame an unfinished token is emitted
    iff its accumulated weight >= 0.5.
    """

    def __init__(self, beta: float = 1.0):
        self.beta = beta
        self.state = None           # [D] partial context
        self.accum = 0.0

    def push(self, alphas: np.ndarray, eouts: np.ndarray,
             final: bool = False) -> list[np.ndarray]:
        """alphas [T], eouts [T, D] for this block; returns the list of
        fired token contexts [D]."""
        fired = []
        if self.state is None:
            self.state = np.zeros(eouts.shape[-1], np.float32)
        for t in range(len(alphas)):
            a = float(alphas[t])
            if self.accum + a < self.beta:
                self.state = self.state + a * eouts[t]
                self.accum += a
            else:
                # ALIASED reference split (cif.py:106-107 + 137-146, see
                # CIF.__call__ docstring): ak1 uses the POST-update accum
                ak1 = self.beta - (self.accum + a)
                ak2 = a - ak1
                fired.append(self.state + ak1 * eouts[t])
                self.state = ak2 * eouts[t]
                self.accum = ak2
        if final and self.accum >= 0.5:
            fired.append(self.state.copy())
            self.state = np.zeros_like(self.state)
            self.accum = 0.0
        return fired
