"""Position-wise feed-forward network (reference
``neural_sp/models/modules/positionwise_feed_forward.py:22-89``):
w1 -> activation (relu/gelu/glu/swish) -> dropout -> w2, with an optional
low-rank bottleneck."""
from __future__ import annotations

import jax.numpy as jnp
import jax
import flax.linen as nn
from ...ops.dropout import Dropout


def activation_fn(name: str):
    return {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "swish": jax.nn.swish,
        "silu": jax.nn.swish,
        "tanh": jnp.tanh,
    }[name]


class FFN(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.0
    activation: str = "relu"
    bottleneck_dim: int = 0

    @nn.compact
    def __call__(self, xs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.bottleneck_dim > 0:
            xs = nn.Dense(self.bottleneck_dim, name="w1_bn")(xs)
        if self.activation == "glu":
            h = nn.Dense(2 * self.d_ff, name="w1")(xs)
            a, b = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(b)
        else:
            h = activation_fn(self.activation)(nn.Dense(self.d_ff, name="w1")(xs))
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        if self.bottleneck_dim > 0:
            h = nn.Dense(self.bottleneck_dim, name="w2_bn")(h)
        return nn.Dense(self.d_model, name="w2")(h)
