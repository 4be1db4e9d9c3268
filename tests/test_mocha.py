"""MoChA/MMA: recurrence math, hard decoding, LAS integration, losses
(pattern follows reference test/modules/test_mocha.py parametrized grid)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.models.modules.mocha import (
    MoChA, safe_cumprod, exclusive_cumprod, moving_sum,
    parallel_monotonic_attention, soft_chunkwise_attention,
    hard_monotonic_attention, hard_chunkwise_attention)

# heavy end-to-end lane (default CI deselects via pytest.ini addopts; run all with `-m ""`)
pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def test_cumprod_helpers():
    x = jnp.asarray([[0.5, 0.5, 0.5]])
    np.testing.assert_allclose(np.asarray(safe_cumprod(x)),
                               [[0.5, 0.25, 0.125]], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(exclusive_cumprod(x)),
                               [[1.0, 0.5, 0.25]], rtol=1e-5)


def test_moving_sum():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    # back=1, forward=0: y[t] = x[t-1] + x[t]
    np.testing.assert_allclose(np.asarray(moving_sum(x, 1, 0)),
                               [[1, 3, 5, 7]], rtol=1e-6)
    # back=0, forward=1: y[t] = x[t] + x[t+1]
    np.testing.assert_allclose(np.asarray(moving_sum(x, 0, 1)),
                               [[3, 5, 7, 4]], rtol=1e-6)


def test_parallel_monotonic_attention_is_distribution_like():
    rng = np.random.default_rng(0)
    p = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((2, 1, 10)) * 2,
                                   jnp.float32))
    a0 = jnp.zeros((2, 1, 10)).at[:, :, 0].set(1.0)
    a1 = parallel_monotonic_attention(p, a0)
    assert (np.asarray(a1) >= 0).all()
    assert (np.asarray(a1).sum(-1) <= 1.0 + 1e-4).all()
    # monotonicity: expectation moves forward across steps
    a2 = parallel_monotonic_attention(p, a1)
    t = np.arange(10)
    e1 = (np.asarray(a1)[0, 0] * t).sum() / max(np.asarray(a1)[0, 0].sum(), 1e-6)
    e2 = (np.asarray(a2)[0, 0] * t).sum() / max(np.asarray(a2)[0, 0].sum(), 1e-6)
    assert e2 >= e1 - 1e-4


def test_soft_chunkwise_attention_masses():
    rng = np.random.default_rng(1)
    alpha = jnp.zeros((1, 1, 8)).at[0, 0, 4].set(1.0)
    u = jnp.asarray(rng.standard_normal((1, 1, 8)), jnp.float32)
    beta = soft_chunkwise_attention(alpha, u, 3)
    b = np.asarray(beta)[0, 0]
    # mass only within the window [2, 4]
    assert b[:2].sum() < 1e-5 and b[5:].sum() < 1e-5
    np.testing.assert_allclose(b.sum(), 1.0, rtol=1e-4)


def test_hard_monotonic_and_chunkwise():
    e = jnp.asarray([[[-10, -10, 10, 10, -10]]], jnp.float32)  # [1,1,5]
    a0 = jnp.zeros((1, 1, 5))
    a1 = hard_monotonic_attention(e, a0)
    np.testing.assert_array_equal(np.asarray(a1)[0, 0], [0, 0, 1, 0, 0])
    # next step starts at the previous boundary
    a2 = hard_monotonic_attention(e, a1)
    np.testing.assert_array_equal(np.asarray(a2)[0, 0], [0, 0, 1, 0, 0])
    # no fire -> zero vector
    a3 = hard_monotonic_attention(-jnp.abs(e) - 1.0, a0)
    assert np.asarray(a3).sum() == 0
    u = jnp.zeros((1, 1, 5))
    beta = hard_chunkwise_attention(a1, u, 2)
    b = np.asarray(beta)[0, 0]
    np.testing.assert_allclose(b, [0, 0.5, 0.5, 0, 0], rtol=1e-5)


def test_mma_eps_wait_sync():
    # two heads: head0 fires at t=1, head1 would fire at t=4
    e = jnp.asarray([[[-10, 10, -10, -10, -10],
                      [-10, -10, -10, -10, 10]]], jnp.float32)
    a0 = jnp.zeros((1, 2, 5))
    a = hard_monotonic_attention(e, a0, eps_wait=1)
    t_bd = np.asarray(jnp.argmax(a, -1))[0]
    assert t_bd[0] == 1 and t_bd[1] <= 2  # head1 clamped to slowest+eps


@pytest.mark.parametrize("chunk_size,h_mono,h_chunk", [
    (1, 1, 1),        # hard monotonic attention
    (4, 1, 1),        # MoChA
    (-1, 1, 1),       # MoChA-inf (infinite lookback)
    (4, 2, 1),        # MMA
    (4, 1, 2),        # multi chunk heads
])
def test_mocha_module_modes(chunk_size, h_mono, h_chunk):
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    a0_shape = (2, h_mono, 12)

    def fwd(mdl, key, q, a0, mode):
        kc = mdl.precompute(key)
        return mdl(kc, q, a0, mode)

    v = MoChA(kdim=16, qdim=8, adim=8, chunk_size=chunk_size,
              n_heads_mono=h_mono, n_heads_chunk=h_chunk)
    a0 = v.init_alpha(2, 12)
    assert a0.shape == a0_shape
    variables = v.init(RNG, key, q, a0, "parallel", method=fwd)
    ctx, alpha, beta = v.apply(variables, key, q, a0, "parallel", method=fwd)
    assert ctx.shape == (2, 16)
    assert alpha.shape == (2, h_mono, 12)
    ctx_h, alpha_h, _ = v.apply(variables, key, q, a0, "hard", method=fwd)
    assert np.isfinite(np.asarray(ctx_h)).all()
    # hard alpha is one-hot or zero per head
    s = np.asarray(alpha_h).sum(-1)
    assert ((np.abs(s - 1) < 1e-5) | (np.abs(s) < 1e-5)).all()


def test_las_mocha_training_and_quantity_loss():
    from neural_sp_tpu.models.decoders.las import RNNDecoder
    dec = RNNDecoder(vocab=11, enc_n_units=16, n_units=24, n_layers=1,
                     emb_dim=8, bottleneck_dim=16, attn_type="mocha",
                     attn_dim=8, mocha_chunk_size=2,
                     quantity_loss_weight=1.0)
    rng = np.random.default_rng(0)
    eouts = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    elens = jnp.asarray([12, 8])
    ys = jnp.asarray([[4, 5, 6, 3], [7, 8, 3, 3]], jnp.int32)
    ylens = jnp.asarray([3, 2])
    v = dec.init(RNG, eouts, elens, ys, ylens)
    loss, obs = dec.apply(v, eouts, elens, ys, ylens, False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert "loss_quantity" in obs and np.isfinite(float(loss))
    g = jax.grad(lambda p: dec.apply(p, eouts, elens, ys, ylens, False,
                                     rngs={"dropout": jax.random.PRNGKey(1)})[0])(v)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    # hard-mode decode step runs (inference path)
    kc = dec.apply(v, eouts, method=dec.precompute_keys)
    from neural_sp_tpu.ops.masks import make_pad_mask
    carry = dec.init_carry(2, 12)
    carry, logits, aw = dec.apply(
        v, carry, jnp.asarray([2, 2], jnp.int32), kc, eouts,
        make_pad_mask(elens, 12), method=dec.decode_step)
    assert logits.shape == (2, 11) and aw.shape == (2, 1, 12)


def test_las_mocha_mma_beam_decode():
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(enc_type="blstm", input_dim=20, enc_n_units=16,
                           enc_n_layers=1, dec_type="lstm", dec_n_units=16,
                           dec_n_layers=1, emb_dim=8, dec_bottleneck_dim=16,
                           attn_type="mocha", attn_dim=8,
                           mocha_chunk_size=2, mocha_n_heads_mono=2,
                           mocha_eps_wait=4, vocab=11, ctc_weight=0.3)
    model = build_speech2text(args)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((1, 24, 20)), jnp.float32)
    xlens = jnp.asarray([24])
    ys = jnp.asarray([[4, 5, 6]], jnp.int32)
    ylens = jnp.asarray([3])
    v = model.init(RNG, xs, xlens, ys, ylens)
    sess = Speech2TextSession(model, v["params"],
                              DecodeConfig(beam_width=3, ctc_weight=0.3))
    hyps = sess.decode_attention_beam(xs, xlens)
    assert len(hyps) == 1


def test_transformer_decoder_mma_training_and_beam():
    """Streaming-MMA transformer decoder: training with quantity loss +
    beam decode with monotonic source attention."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="blstm", input_dim=20, enc_n_units=16, enc_n_layers=1,
        dec_type="transformer", transformer_d_model=16, transformer_d_ff=32,
        transformer_n_heads=2, dec_n_layers=2, mocha_first_layer=2,
        mocha_chunk_size=2, mocha_n_heads_mono=2, mocha_eps_wait=4,
        mocha_quantity_loss_weight=1.0, vocab=11, ctc_weight=0.3)
    model = build_speech2text(args)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 20, 20)), jnp.float32)
    xlens = jnp.asarray([20, 14])
    ys = jnp.asarray([[4, 5, 6, 3], [7, 8, 3, 3]], jnp.int32)
    ylens = jnp.asarray([3, 2])
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, obs = model.apply(v, xs, xlens, ys, ylens, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert "loss_quantity" in obs and np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(
        p, xs, xlens, ys, ylens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})[0])(v)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    sess = Speech2TextSession(model, v["params"],
                              DecodeConfig(beam_width=3, ctc_weight=0.3))
    hyps = sess.decode_attention_beam(xs[:1], xlens[:1])
    assert len(hyps) == 1


def test_triggered_attention_and_decot():
    """Triggered attention restricts context to CTC boundaries; DeCoT masks
    MoChA alignment past triggers."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    xlens = jnp.asarray([24, 18])
    ys = jnp.asarray([[4, 5, 6, 3], [7, 8, 3, 3]], jnp.int32)
    ylens = jnp.asarray([3, 2])
    for kw in (dict(attn_type="triggered"),
               dict(attn_type="mocha", mocha_chunk_size=2,
                    mocha_latency_metric="decot",
                    mocha_latency_loss_weight=0.0)):
        args = SimpleNamespace(enc_type="blstm", input_dim=20, enc_n_units=16,
                               enc_n_layers=1, dec_type="lstm",
                               dec_n_units=16, dec_n_layers=1, emb_dim=8,
                               dec_bottleneck_dim=16, attn_dim=16,
                               attn_conv_width=9, vocab=11, ctc_weight=0.3,
                               **kw)
        model = build_speech2text(args)
        v = model.init(RNG, xs, xlens, ys, ylens)
        loss, obs = model.apply(v, xs, xlens, ys, ylens, deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(float(loss)), kw
        g = jax.grad(lambda p: model.apply(
            p, xs, xlens, ys, ylens, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)})[0])(v)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(g)), kw
