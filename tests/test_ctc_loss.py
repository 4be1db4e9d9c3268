"""Validate the TPU-native CTC scan kernel against torch.nn.CTCLoss (CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neural_sp_tpu.ops.ctc import ctc_loss, ctc_forced_align

torch = pytest.importorskip("torch")


def _rand_case(rng, bs, tmax, umax, vocab):
    logits = rng.standard_normal((bs, tmax, vocab)).astype(np.float32) * 2.0
    xlens = rng.integers(umax * 2 + 2, tmax + 1, size=bs).astype(np.int32)
    xlens[0] = tmax
    ylens = rng.integers(1, umax + 1, size=bs).astype(np.int32)
    labels = rng.integers(1, vocab, size=(bs, umax)).astype(np.int32)
    return logits, xlens, labels, ylens


@pytest.mark.parametrize("bs,tmax,umax,vocab", [(1, 12, 4, 6), (4, 30, 8, 11), (3, 50, 20, 5)])
def test_ctc_loss_matches_torch(bs, tmax, umax, vocab):
    rng = np.random.default_rng(0)
    logits, xlens, labels, ylens = _rand_case(rng, bs, tmax, umax, vocab)
    log_probs = np.asarray(
        torch.log_softmax(torch.tensor(logits), dim=-1).numpy())

    ours = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(labels), jnp.asarray(xlens),
        jnp.asarray(ylens), reduction="none")

    ref = torch.nn.functional.ctc_loss(
        torch.tensor(log_probs).transpose(0, 1),
        torch.tensor(labels.astype(np.int64)),
        torch.tensor(xlens.astype(np.int64)),
        torch.tensor(ylens.astype(np.int64)),
        blank=0, reduction="none", zero_infinity=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_grad_matches_torch():
    rng = np.random.default_rng(1)
    logits, xlens, labels, ylens = _rand_case(rng, 3, 24, 6, 8)

    import jax

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.asarray(labels), jnp.asarray(xlens),
                        jnp.asarray(ylens), reduction="sum_over_batch")

    g_ours = jax.grad(loss_fn)(jnp.asarray(logits))

    lt = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(lt, dim=-1)
    ref = torch.nn.functional.ctc_loss(
        lp.transpose(0, 1), torch.tensor(labels.astype(np.int64)),
        torch.tensor(xlens.astype(np.int64)), torch.tensor(ylens.astype(np.int64)),
        blank=0, reduction="sum", zero_infinity=True) / 3
    ref.backward()
    np.testing.assert_allclose(np.asarray(g_ours), lt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_infeasible_zeroed():
    """True CTC feasibility is U + #repeats <= T (a repeated label needs an
    intervening blank), NOT 2U+1 <= T — torch CTCLoss(zero_infinity=True)
    gives 9.8287 for [1,2,3,4] @ T=5 and 0.0 for [1,1,1,1] @ T=5 (oracle
    run); the over-strict rule silently zeroed CTC for the entire flagship
    batch (U=100 wordpieces, T'=188 frames after x8 subsampling)."""
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 5, 6)).astype(np.float32)
    log_probs = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    labels = np.array([[1, 2, 3, 4], [1, 1, 1, 1]], np.int32)
    out = ctc_loss(jnp.asarray(log_probs), jnp.asarray(labels),
                   jnp.asarray([5, 5], np.int32), jnp.asarray([4, 4], np.int32),
                   reduction="none")
    # distinct labels, U=4 <= T=5 -> feasible (torch: 9.8287)
    np.testing.assert_allclose(float(out[0]), 9.8287, rtol=1e-3)
    # all-repeats: U + 3 repeats = 7 > 5 -> infeasible -> 0
    assert float(out[1]) == 0.0


def test_forced_align_monotone_and_valid():
    rng = np.random.default_rng(3)
    bs, tmax, umax, vocab = 3, 40, 6, 10
    logits, xlens, labels, ylens = _rand_case(rng, bs, tmax, umax, vocab)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    trig, paths = ctc_forced_align(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(xlens), jnp.asarray(ylens))
    trig = np.asarray(trig)
    paths = np.asarray(paths)
    for b in range(bs):
        u = int(ylens[b])
        t = trig[b, :u]
        assert np.all(np.diff(t) > 0), t  # strictly increasing boundaries
        assert t[-1] < xlens[b]
        # the aligned path restricted to non-blank, deduped = labels
        p = paths[b, : xlens[b]]
        collapsed = []
        prev = -1
        for fr, lab in enumerate(p):
            if lab != 0 and (lab != prev):
                collapsed.append(lab)
            prev = lab if lab != 0 else (-1 if lab == 0 else prev)
        # CTC collapse: remove repeats then blanks
        collapsed = []
        prev = 0
        for lab in p:
            if lab != 0 and lab != prev:
                collapsed.append(int(lab))
            prev = int(lab)
        assert collapsed == list(labels[b, :u])


