"""NN module layer: attention variants, rel-MHA, conv blocks, RNN layers."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.models.modules.multihead_attention import MultiheadAttention
from neural_sp_tpu.models.modules.relative_multihead_attention import (
    RelativeMultiheadAttention)
from neural_sp_tpu.models.modules.attention import AttentionMechanism
from neural_sp_tpu.models.modules.gmm_attention import GMMAttention
from neural_sp_tpu.models.modules.conformer_convolution import ConformerConvBlock
from neural_sp_tpu.models.modules.feed_forward import FFN
from neural_sp_tpu.models.modules.glu import LinearGLUBlock, ConvGLUBlock
from neural_sp_tpu.models.modules.recurrent import RNNLayer
from neural_sp_tpu.ops.masks import make_pad_mask, make_san_mask

RNG = jax.random.PRNGKey(0)


def _x(b=2, t=10, d=8, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((b, t, d)),
                       jnp.float32)


@pytest.mark.parametrize("atype", ["scaled_dot", "add"])
def test_mha_shapes_and_mask(atype):
    xs = _x()
    xlens = jnp.asarray([10, 6])
    mha = MultiheadAttention(d_model=8, n_heads=2, atype=atype)
    v = mha.init(RNG, xs, xs, xs)
    out, cache, aws = mha.apply(v, xs, xs, xs,
                                make_san_mask(make_pad_mask(xlens, 10)),
                                return_weights=True)
    assert out.shape == (2, 10, 8) and cache["k"].shape == (2, 10, 2, 4)
    # no attention mass on padded keys for valid queries
    assert float(np.abs(np.asarray(aws)[1, :, :6, 6:]).sum()) < 1e-6


def test_mha_incremental_cache_matches_full():
    xs = _x()
    mha = MultiheadAttention(d_model=8, n_heads=2)
    v = mha.init(RNG, xs, xs, xs)
    from neural_sp_tpu.ops.masks import causal_mask
    full, _, _ = mha.apply(v, xs, xs, xs, causal_mask(10, 10)[None])
    cache = None
    outs = []
    for t in range(10):
        o, cache, _ = mha.apply(v, xs[:, t:t+1], xs[:, t:t+1], xs[:, t:t+1],
                                None, cache)
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=1e-4, atol=1e-5)


def test_rel_mha_streaming_offset_consistency():
    """Full-utterance rel-MHA == chunked rel-MHA with KV cache (causal)."""
    xs = _x(t=12)
    from neural_sp_tpu.ops.masks import causal_mask
    rmha = RelativeMultiheadAttention(d_model=8, n_heads=2)
    v = rmha.init(RNG, xs)
    full, _, _ = rmha.apply(v, xs, mask=causal_mask(12, 12)[None])
    # two chunks of 6 with cache
    o1, c1, _ = rmha.apply(v, xs[:, :6], mask=causal_mask(6, 6)[None])
    o2, _, _ = rmha.apply(v, xs[:, 6:], cache=c1,
                          mask=causal_mask(6, 12, offset=6)[None])
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jnp.concatenate([o1, o2], 1)),
                               rtol=1e-4, atol=1e-5)


def test_rel_mha_clamp_len_translation_invariance():
    xs = _x(t=8)
    rmha = RelativeMultiheadAttention(d_model=8, n_heads=2, clamp_len=3)
    v = rmha.init(RNG, xs)
    out, _, _ = rmha.apply(v, xs)
    assert out.shape == (2, 8, 8)


@pytest.mark.parametrize("atype", ["location", "add", "dot", "luong_dot",
                                   "luong_general", "luong_concat", "no"])
def test_single_head_attention(atype):
    xs = _x()
    xlens = jnp.asarray([10, 6])
    qdim = 8 if atype in ("dot", "luong_dot", "luong_general") else 6
    att = AttentionMechanism(kdim=8, qdim=qdim, adim=8, atype=atype)
    q = jnp.zeros((2, qdim))
    aw0 = jnp.zeros((2, 10)).at[:, 0].set(1.0)
    v = att.init(RNG, xs, xs, q, make_pad_mask(xlens, 10), aw0)
    kc = att.apply(v, xs, method=att.precompute)
    ctx, aw = att.apply(v, xs, xs, q, make_pad_mask(xlens, 10), aw0,
                        key_cache=kc)
    assert ctx.shape == (2, 8)
    assert float(np.abs(np.asarray(aw)[1, 6:]).sum()) < 1e-6


def test_gmm_attention_monotonic():
    xs = _x()
    g = GMMAttention(kdim=8, qdim=6, adim=8)
    q = jnp.zeros((2, 6))
    v = g.init(RNG, xs, xs, q)
    _, _, myu1 = g.apply(v, xs, xs, q)
    _, _, myu2 = g.apply(v, xs, xs, q, myu_prev=myu1)
    assert (np.asarray(myu2) > np.asarray(myu1)).all()


def test_conformer_conv_streaming_equivalence():
    xs = _x(t=16)
    cc = ConformerConvBlock(d_model=8, kernel_size=5, causal=True,
                            normalization="layer_norm")
    v = cc.init(RNG, xs)
    full, _ = cc.apply(v, xs)
    h1, c1 = cc.apply(v, xs[:, :8])
    h2, _ = cc.apply(v, xs[:, 8:], conv_cache=c1)
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jnp.concatenate([h1, h2], 1)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "gelu", "swish", "glu"])
def test_ffn(act):
    xs = _x()
    ffn = FFN(d_model=8, d_ff=16, activation=act)
    v = ffn.init(RNG, xs)
    assert ffn.apply(v, xs).shape == (2, 10, 8)


def test_glu_blocks():
    xs = _x()
    m = LinearGLUBlock(size=8)
    v = m.init(RNG, xs)
    assert m.apply(v, xs).shape == (2, 10, 8)
    c = ConvGLUBlock(kernel_size=3, in_ch=8, out_ch=8)
    v = c.init(RNG, xs)
    out = c.apply(v, xs)
    assert out.shape == (2, 10, 8)


@pytest.mark.parametrize("bidir,merge", [(False, "sum"), (True, "sum"),
                                         (True, "concat")])
def test_rnn_layer(bidir, merge):
    xs = _x()
    xlens = jnp.asarray([10, 6])
    m = RNNLayer(units=12, bidirectional=bidir, merge=merge)
    v = m.init(RNG, xs, xlens)
    ys, carry = m.apply(v, xs, xlens)
    d = 12 if (not bidir or merge == "sum") else 24
    assert ys.shape == (2, 10, d)
    # state carry roundtrip: split the sequence, pass carry
    ys1, c1 = m.apply(v, xs[:, :5], None)
    ys2, _ = m.apply(v, xs[:, 5:], None, carry=c1)
    if not bidir:
        full_nolen, _ = m.apply(v, xs, None)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([ys1, ys2], 1)),
            np.asarray(full_nolen), rtol=1e-4, atol=1e-5)


def test_zoneout_runs():
    xs = _x()
    m = RNNLayer(units=12, zoneout_h=0.1, zoneout_c=0.1)
    v = m.init(RNG, xs, None)
    ys, _ = m.apply(v, xs, None, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(ys)).all()
