"""Validate the transducer lattice scan against a numpy DP oracle (and torch
autograd numerics for the gradient)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.ops.rnnt import rnnt_loss

NEG_INF = -1.0e30


def rnnt_numpy(log_probs, labels, xlen, ylen, blank=0):
    """O(T*U) scalar DP reference."""
    T, U1, _ = log_probs.shape
    U = ylen
    alpha = np.full((xlen, U + 1), NEG_INF, np.float64)
    alpha[0, 0] = 0.0
    for t in range(xlen):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else NEG_INF
    return -(alpha[xlen - 1, U] + log_probs[xlen - 1, U, blank])


@pytest.mark.parametrize("bs,tmax,umax,vocab", [(2, 8, 3, 5), (3, 17, 9, 12)])
def test_rnnt_matches_numpy(bs, tmax, umax, vocab):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((bs, tmax, umax + 1, vocab)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    xlens = rng.integers(2, tmax + 1, size=bs).astype(np.int32)
    xlens[0] = tmax
    ylens = rng.integers(1, umax + 1, size=bs).astype(np.int32)
    labels = rng.integers(1, vocab, size=(bs, umax)).astype(np.int32)

    ours = rnnt_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(xlens),
                     jnp.asarray(ylens), reduction="none")
    expect = [rnnt_numpy(lp[b], labels[b], int(xlens[b]), int(ylens[b]))
              for b in range(bs)]
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-4, atol=1e-4)


def test_rnnt_grad_finite_and_descends():
    rng = np.random.default_rng(1)
    bs, tmax, umax, vocab = 2, 10, 4, 6
    logits = jnp.asarray(rng.standard_normal((bs, tmax, umax + 1, vocab)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, vocab, size=(bs, umax)).astype(np.int32))
    xlens = jnp.asarray([tmax, 7], jnp.int32)
    ylens = jnp.asarray([4, 2], jnp.int32)

    def f(lg):
        return rnnt_loss(jax.nn.log_softmax(lg, -1), labels, xlens, ylens)

    l0 = f(logits)
    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    l1 = f(logits - 0.5 * g)
    assert float(l1) < float(l0)
    # frames past xlen and label slots past ylen must have zero gradient
    gn = np.asarray(g)
    assert np.abs(gn[1, 7:]).max() == 0.0


def test_rnnt_grad_matches_finite_difference():
    rng = np.random.default_rng(2)
    bs, tmax, umax, vocab = 1, 5, 2, 4
    logits = rng.standard_normal((bs, tmax, umax + 1, vocab)).astype(np.float64)
    labels = jnp.asarray([[1, 2]], jnp.int32)
    xlens = jnp.asarray([5], jnp.int32)
    ylens = jnp.asarray([2], jnp.int32)

    def f(lg):
        return rnnt_loss(jax.nn.log_softmax(lg, -1), labels, xlens, ylens)

    g = np.asarray(jax.grad(f)(jnp.asarray(logits, jnp.float32)))
    eps = 1e-3
    for idx in [(0, 0, 0, 1), (0, 2, 1, 0), (0, 4, 2, 3)]:
        lp = logits.copy(); lp[idx] += eps
        lm = logits.copy(); lm[idx] -= eps
        fd = (float(f(jnp.asarray(lp, jnp.float32))) -
              float(f(jnp.asarray(lm, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=2e-3)


def test_rnnt_from_logits_matches_log_probs_path():
    rng = np.random.default_rng(3)
    bs, tmax, umax, vocab = 2, 9, 4, 7
    logits = jnp.asarray(rng.standard_normal(
        (bs, tmax, umax + 1, vocab)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, vocab, (bs, umax)), jnp.int32)
    xlens = jnp.asarray([9, 6], jnp.int32)
    ylens = jnp.asarray([4, 2], jnp.int32)
    from neural_sp_tpu.ops.rnnt import rnnt_loss_from_logits
    a = rnnt_loss_from_logits(logits, labels, xlens, ylens, reduction="none")
    b = rnnt_loss(jax.nn.log_softmax(logits, -1), labels, xlens, ylens,
                  reduction="none")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)
    # gradients agree too
    ga = jax.grad(lambda l: rnnt_loss_from_logits(l, labels, xlens, ylens))(
        logits)
    gb = jax.grad(lambda l: rnnt_loss(jax.nn.log_softmax(l, -1), labels,
                                      xlens, ylens))(logits)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-3,
                               atol=1e-5)
