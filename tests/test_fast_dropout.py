"""Fast hash-based dropout (ops/dropout.py) — statistical sanity +
flax-API equivalence. The threefry masks cost ~26 ms/step on the flagship
(r3 measurement); this generator must be cheap AND statistically usable."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from neural_sp_tpu.ops.dropout import Dropout, fast_uniform, fast_bernoulli


def test_uniform_range_and_mean():
    u = np.asarray(fast_uniform(jax.random.PRNGKey(0), (100_000,)))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.005


def test_uniform_key_sensitivity():
    a = np.asarray(fast_uniform(jax.random.PRNGKey(1), (1000,)))
    b = np.asarray(fast_uniform(jax.random.PRNGKey(2), (1000,)))
    assert not np.allclose(a, b)
    # same key -> deterministic
    c = np.asarray(fast_uniform(jax.random.PRNGKey(1), (1000,)))
    np.testing.assert_array_equal(a, c)


def test_no_adjacent_lane_correlation():
    u = np.asarray(fast_uniform(jax.random.PRNGKey(3), (50_000,)))
    r = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(r) < 0.02


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_bernoulli_rate(rate):
    m = np.asarray(fast_bernoulli(jax.random.PRNGKey(0), 1 - rate,
                                  (200_000,)))
    assert abs(m.mean() - (1 - rate)) < 0.01


def test_dropout_module_semantics():
    x = jnp.ones((4, 1000))
    d = Dropout(rate=0.3)
    # deterministic: identity
    y = d.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # training: kept elements scaled by 1/keep, drop fraction ~ rate
    y = d.apply({}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    kept = y > 0
    assert abs(kept.mean() - 0.7) < 0.03
    np.testing.assert_allclose(y[kept], 1.0 / 0.7, rtol=1e-6)
    # rate 0 short-circuits
    y0 = Dropout(rate=0.0).apply({}, x, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))


def test_dropout_distinct_sites_distinct_masks():
    """Two Dropout sites in one module get independent masks via flax rng
    folding (same guarantee nn.Dropout relies on)."""
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = Dropout(0.5)(x, deterministic=False)
            b = Dropout(0.5)(x, deterministic=False)
            return a, b

    x = jnp.ones((2000,))
    a, b = M().apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    assert not np.array_equal(np.asarray(a) > 0, np.asarray(b) > 0)
