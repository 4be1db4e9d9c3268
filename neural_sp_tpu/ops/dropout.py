"""Low-overhead dropout for the TPU hot path.

``jax.random.bernoulli``'s threefry keygen lowers to dozens of HLO ops per
mask; on the flagship train step the dropout masks alone cost ~26 ms of a
96 ms step (measured r3, tools/ab_dropout.py). Dropout does not need
crypto-grade bits: ``fast_uniform`` hashes a lane counter with a
murmur-style finalizer mixed with the (threefry-derived) per-site key —
distinct flax rng paths still give independent masks, and the per-element
bits pass basic uniformity checks (see tests/test_fast_dropout.py).

``Dropout`` is a drop-in ``flax.linen.Dropout`` subclass; all framework
modules use it instead of ``nn.Dropout``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def _key_data(rng) -> jnp.ndarray:
    """uint32 words of either a typed PRNG key or a raw uint32 key array."""
    try:
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
            rng = jax.random.key_data(rng)
    except (TypeError, AttributeError):
        pass
    return jnp.asarray(rng, jnp.uint32).reshape(-1)


def fast_uniform(rng, shape, dtype=jnp.float32) -> jnp.ndarray:
    """[0, 1) uniforms from a cheap counter hash (NOT for sampling weights /
    exploration — dropout and other masking only)."""
    kd = _key_data(rng)
    n = int(np.prod(shape)) if shape else 1
    x = lax.iota(jnp.uint32, n)
    x = x * jnp.uint32(0x9E3779B9) + kd[0]
    x = x ^ (x >> 16)
    x = x * (jnp.uint32(0x7FEB352D) ^ kd[-1])
    x = x ^ (x >> 15)
    # 24-bit mantissa -> exact float in [0, 1)
    return ((x >> 8).astype(dtype) * dtype(1.0 / 16777216.0)).reshape(shape)


def fast_bernoulli(rng, p, shape) -> jnp.ndarray:
    """Boolean mask, True with probability ``p``."""
    return fast_uniform(rng, shape) < p


class Dropout(nn.Dropout):
    """``nn.Dropout`` with the fast mask generator (same API/semantics)."""

    @nn.compact
    def __call__(self, inputs, deterministic=None, rng=None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if (self.rate == 0.0) or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        keep_prob = 1.0 - self.rate
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        # broadcast_dims semantics match nn.Dropout
        broadcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            broadcast_shape[dim] = 1
        mask = fast_bernoulli(rng, keep_prob, tuple(broadcast_shape))
        mask = jnp.broadcast_to(mask, inputs.shape)
        return jnp.where(mask, inputs / keep_prob, jnp.zeros_like(inputs))
