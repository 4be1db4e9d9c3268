import numpy as np
import jax
import jax.numpy as jnp

from neural_sp_tpu.ops.masks import (
    make_pad_mask, make_san_mask, causal_mask, make_chunkwise_san_mask)
from neural_sp_tpu.ops.criterion import (
    cross_entropy_lsm, compute_accuracy, kldiv_lsm_ctc, focal_loss)


def test_make_pad_mask():
    m = make_pad_mask(jnp.asarray([3, 1]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), [[True, True, True, False], [True, False, False, False]])


def test_causal_mask():
    m = np.asarray(causal_mask(3, 3))
    assert m[0, 1] == False and m[2, 1] == True and m[1, 1] == True


def test_chunkwise_mask_limits_context():
    pad = make_pad_mask(jnp.asarray([8, 8]), 8)
    m = np.asarray(make_chunkwise_san_mask(pad, 2, 2, 2))
    # frame 0 (chunk 0): keys [max(0,-2), 4) -> cannot see key 4
    assert m[0, 0, 3] and not m[0, 0, 4]
    # frame 4 (chunk 2): keys [2, 8)
    assert not m[0, 4, 1] and m[0, 4, 2] and m[0, 4, 7]
    # unlimited left context
    m2 = np.asarray(make_chunkwise_san_mask(pad, -1, 2, 0))
    assert m2[0, 7, 0]


def test_cross_entropy_lsm_values():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 5, 7)).astype(np.float32))
    ys = jnp.asarray([[1, 2, 3, -1, -1], [4, 5, -1, -1, -1]], jnp.int32)
    loss, nll = cross_entropy_lsm(logits, ys, lsm_prob=0.1, ignore_index=-1)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # normalize_length reduces scale by ~tokens/batch
    loss_len, _ = cross_entropy_lsm(
        logits, ys, lsm_prob=0.1, ignore_index=-1, normalize_length=True)
    np.testing.assert_allclose(float(loss) * 2 / 5, float(loss_len), rtol=1e-5)


def test_accuracy_and_focal_and_kldiv():
    logits = jnp.asarray(np.eye(4, dtype=np.float32)[None] * 10.0)  # [1,4,4]
    ys = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    assert float(compute_accuracy(logits, ys)) == 100.0
    assert float(focal_loss(logits, ys)) >= 0.0
    kl = kldiv_lsm_ctc(logits, jnp.asarray([4], jnp.int32))
    assert float(kl) > 0.0


def test_grad_flows_through_lsm():
    logits = jnp.ones((1, 3, 5), jnp.float32)
    ys = jnp.asarray([[1, 2, -1]], jnp.int32)
    g = jax.grad(lambda l: cross_entropy_lsm(l, ys, 0.1)[0])(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)[0, 2]).sum() == 0.0  # masked token has no grad


def test_edit_distance():
    from neural_sp_tpu.evaluators.edit_distance import (
        compute_wer, compute_cer, wer_align)
    wer, s, i, d = compute_wer("a b c d".split(), "a x c".split())
    assert (s, i, d) == (1, 0, 1) and wer == 50.0
    assert compute_wer([], [])[0] == 0.0
    assert compute_cer("abcd", "abcd") == 0.0
    out = wer_align("a b c".split(), "a c".split())
    assert "REF" in out and "D" in out
