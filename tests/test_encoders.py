"""Encoder grid tests (pattern follows reference test strategy, SURVEY.md §4:
parametrized config sweeps, forward shape/finiteness checks, tiny dims)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.models.encoders.rnn import RNNEncoder
from neural_sp_tpu.models.encoders.transformer import XformerEncoder
from neural_sp_tpu.models.encoders.tds import TDSEncoder
from neural_sp_tpu.models.encoders.gated_conv import GatedConvEncoder
from neural_sp_tpu.models.encoders.conv import ConvEncoder
from neural_sp_tpu.models.encoders.build import build_encoder

RNG = jax.random.PRNGKey(0)


def _x(b=2, t=43, d=20, seed=0):
    xs = jnp.asarray(np.random.default_rng(seed).standard_normal((b, t, d)),
                     jnp.float32)
    xlens = jnp.asarray([t, t - 11], jnp.int32)
    return xs, xlens


def test_conv_encoder_subsampling():
    xs, xlens = _x()
    enc = ConvEncoder(input_dim=20, channels="8_8", poolings="(2,2)_(2,2)")
    assert enc.subsampling_factor == 4
    v = enc.init(RNG, xs, xlens)
    ys, ylens = enc.apply(v, xs, xlens)
    assert ys.shape[1] == -(-43 // 4)
    assert ys.shape[2] == enc.output_dim()
    assert int(ylens[1]) == -(-32 // 4)


@pytest.mark.parametrize("rnn_type,n_projs,subsample,subsample_type", [
    ("blstm", 0, (), "drop"),
    ("lstm", 8, (1, 2), "drop"),
    ("blstm", 0, (2, 2), "concat"),
    ("bgru", 0, (2, 1), "max_pool"),
    ("blstm", 8, (1, 2), "conv1d"),
])
def test_rnn_encoder_variants(rnn_type, n_projs, subsample, subsample_type):
    xs, xlens = _x()
    enc = RNNEncoder(input_dim=20, rnn_type=rnn_type, n_units=16,
                     n_projs=n_projs, n_layers=2, subsample=subsample,
                     subsample_type=subsample_type)
    v = enc.init(RNG, xs, xlens)
    eouts, carry = enc.apply(v, xs, xlens)
    ys = eouts["ys"]["xs"]
    assert ys.shape[-1] == enc.output_dim
    factor = int(np.prod(subsample)) if subsample else 1
    assert ys.shape[1] == -(-43 // factor) or ys.shape[1] >= 43 // factor
    assert np.isfinite(np.asarray(ys)).all()


def test_rnn_encoder_conv_frontend_and_subtasks():
    xs, xlens = _x()
    enc = RNNEncoder(input_dim=20, rnn_type="blstm", n_units=16, n_layers=3,
                     n_layers_sub1=2, n_layers_sub2=1,
                     conv_channels="4_4", conv_kernel_sizes="(3,3)_(3,3)",
                     conv_poolings="(2,2)_(2,2)", task_specific_layer=True,
                     last_proj_dim=12)
    v = enc.init(RNG, xs, xlens)
    eouts, _ = enc.apply(v, xs, xlens)
    assert set(eouts) == {"ys", "ys_sub1", "ys_sub2"}
    for k in eouts:
        assert eouts[k]["xs"].shape[-1] == 12
    assert enc.subsampling_factor == 4


def test_lc_blstm_matches_full_when_chunks_cover_all():
    """LC-BLSTM with right context >= T == full-context BLSTM numerics."""
    xs, xlens = _x(t=16)
    enc_lc = RNNEncoder(input_dim=20, rnn_type="blstm", n_units=16,
                        n_layers=1, chunk_size_current=16,
                        chunk_size_right=0)
    v = enc_lc.init(RNG, xs, xlens)
    eouts_lc, _ = enc_lc.apply(v, xs, None)
    enc_full = RNNEncoder(input_dim=20, rnn_type="blstm", n_units=16,
                          n_layers=1)
    eouts_full, _ = enc_full.apply(v, xs, None)
    np.testing.assert_allclose(np.asarray(eouts_lc["ys"]["xs"]),
                               np.asarray(eouts_full["ys"]["xs"]),
                               rtol=1e-4, atol=1e-5)


def test_lc_blstm_chunked_differs_from_full():
    xs, xlens = _x(t=16)
    enc_lc = RNNEncoder(input_dim=20, rnn_type="blstm", n_units=16,
                        n_layers=1, chunk_size_current=4, chunk_size_right=2)
    v = enc_lc.init(RNG, xs, xlens)
    eouts, _ = enc_lc.apply(v, xs, xlens)
    assert eouts["ys"]["xs"].shape == (2, 16, 16)


@pytest.mark.parametrize("btype,pe_type", [
    ("transformer", "add"),
    ("transformer", "relative"),
    ("conformer", "relative"),
    ("conformer_v2", "add"),
])
def test_xformer_encoder_variants(btype, pe_type):
    xs, xlens = _x()
    enc = XformerEncoder(input_dim=20, btype=btype, d_model=16, d_ff=32,
                         n_heads=2, n_layers=2, pe_type=pe_type,
                         conv_kernel_size=7)
    v = enc.init(RNG, xs, xlens)
    eouts = enc.apply(v, xs, xlens)
    assert eouts["ys"]["xs"].shape == (2, 43, 16)
    assert np.isfinite(np.asarray(eouts["ys"]["xs"])).all()


def test_xformer_conv_frontend_subsample8():
    xs, xlens = _x(t=64)
    enc = XformerEncoder(input_dim=20, btype="conformer", d_model=16, d_ff=32,
                         n_heads=2, n_layers=3, pe_type="relative",
                         conv_kernel_size=7,
                         conv_channels="4_4", conv_kernel_sizes="(3,3)_(3,3)",
                         conv_poolings="(2,2)_(2,2)", subsample=(1, 2, 1),
                         subsample_type="drop")
    assert enc.subsampling_factor == 8
    v = enc.init(RNG, xs, xlens)
    eouts = enc.apply(v, xs, xlens)
    assert eouts["ys"]["xs"].shape[1] == 8
    assert int(eouts["ys"]["xlens"][1]) == -(-(-(-53 // 4)) // 2)


@pytest.mark.parametrize("streaming_type", ["mask", "reshape"])
def test_xformer_streaming_modes(streaming_type):
    xs, xlens = _x(t=40)
    enc = XformerEncoder(input_dim=20, btype="transformer", d_model=16,
                         d_ff=32, n_heads=2, n_layers=2, pe_type="add",
                         chunk_size_left=8, chunk_size_current=8,
                         chunk_size_right=4, streaming_type=streaming_type)
    v = enc.init(RNG, xs, xlens)
    eouts = enc.apply(v, xs, xlens)
    assert eouts["ys"]["xs"].shape == (2, 40, 16)
    assert np.isfinite(np.asarray(eouts["ys"]["xs"])).all()


def test_xformer_mask_mode_blocks_future_context():
    """In `mask` streaming mode, changing far-future frames must not change
    early outputs."""
    xs, xlens = _x(t=32)
    enc = XformerEncoder(input_dim=20, btype="transformer", d_model=16,
                         d_ff=32, n_heads=2, n_layers=2, pe_type="add",
                         chunk_size_left=-1, chunk_size_current=8,
                         chunk_size_right=0, streaming_type="mask")
    v = enc.init(RNG, xs, xlens)
    out1 = enc.apply(v, xs, xlens)["ys"]["xs"]
    xs2 = xs.at[:, 20:].add(5.0)
    out2 = enc.apply(v, xs2, xlens)["ys"]["xs"]
    np.testing.assert_allclose(np.asarray(out1[:, :8]),
                               np.asarray(out2[:, :8]), rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(out1[:, 24:] - out2[:, 24:])).max() > 1e-3


def test_tds_encoder():
    xs, xlens = _x(t=64)
    enc = TDSEncoder(input_dim=20, channels="4_4_6", kernel_sizes="5_5_5")
    assert enc.subsampling_factor == 4
    v = enc.init(RNG, xs, xlens)
    eouts = enc.apply(v, xs, xlens)
    assert eouts["ys"]["xs"].shape == (2, 16, enc.output_dim)


def test_gated_conv_encoder():
    xs, xlens = _x()
    enc = GatedConvEncoder(input_dim=20, layers="12:3_12:3")
    v = enc.init(RNG, xs, xlens)
    eouts = enc.apply(v, xs, xlens)
    assert eouts["ys"]["xs"].shape == (2, 43, 12)


def test_build_encoder_dispatch():
    from types import SimpleNamespace
    xs, xlens = _x()
    for enc_type in ["blstm", "conv_blstm", "transformer", "conv_conformer",
                     "tds", "gated_conv"]:
        args = SimpleNamespace(
            enc_type=enc_type, input_dim=20, enc_n_units=16, enc_n_layers=2,
            transformer_d_model=16, transformer_d_ff=32,
            transformer_n_heads=2,
            conv_channels="4_4" if "conv" in enc_type else
            ("4_4_6" if enc_type == "tds" else ""),
            conv_kernel_sizes="(3,3)_(3,3)", conv_poolings="(2,2)_(2,2)",
            tds_kernel_sizes="5_5_5", gated_conv_layers="12:3_12:3",
            transformer_enc_pe_type="relative" if "conformer" in enc_type
            else "add")
        enc = build_encoder(args)
        v = enc.init(RNG, xs, xlens)
        out = enc.apply(v, xs, xlens)
        eouts = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(np.asarray(eouts["ys"]["xs"])).all(), enc_type


# --------------------------------------------------------------------- #
# Bucket-pad invariance (VERDICT r4 / ADVICE r4): under the sampler's
# padded-area shape grid, batches are padded BEYOND max(xlens). The batch
# edge must behave exactly like the reference's array end (which stops at
# max(xlens)): valid frames computed from a bucket-padded batch must match
# the packed batch — through the conv frontend's unmasked conv/ceil-pool
# and the conformer block's intentionally-unmasked depthwise conv.
# --------------------------------------------------------------------- #
def _pad_t(xs, extra):
    return jnp.pad(xs, ((0, 0), (0, extra), (0, 0)))


def test_conv_encoder_bucket_pad_invariance():
    xs, xlens = _x(t=63)  # odd length: exercises the straddling pool window
    enc = ConvEncoder(input_dim=20, channels="8_8", poolings="(2,2)_(2,2)")
    v = enc.init(RNG, xs, xlens)
    ys, ylens = enc.apply(v, xs, xlens)
    ys2, ylens2 = enc.apply(v, _pad_t(xs, 33), xlens)
    t_out = ys.shape[1]
    np.testing.assert_allclose(np.asarray(ys2[:, :t_out]), np.asarray(ys),
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(ylens2) == np.asarray(ylens)).all()


def test_conformer_encoder_bucket_pad_invariance():
    xs, xlens = _x(t=63)
    enc = XformerEncoder(input_dim=20, btype="conformer", d_model=16, d_ff=32,
                         n_heads=2, n_layers=2, pe_type="relative",
                         conv_kernel_size=7, conv_channels="4_4",
                         conv_kernel_sizes="(3,3)_(3,3)",
                         conv_poolings="(2,2)_(2,2)")
    v = enc.init(RNG, xs, xlens)
    e1 = enc.apply(v, xs, xlens)["ys"]
    e2 = enc.apply(v, _pad_t(xs, 33), xlens)["ys"]
    t_out = e1["xs"].shape[1]
    # only frames valid for SOME utterance are comparable; beyond each
    # utterance's own length the reference leaks pad deliberately, but that
    # leak must be identical in both batches
    np.testing.assert_allclose(np.asarray(e2["xs"][:, :t_out]),
                               np.asarray(e1["xs"]), rtol=2e-5, atol=2e-5)
    assert (np.asarray(e2["xlens"]) == np.asarray(e1["xlens"])).all()


def test_mask_mode_chunked_bucket_pad_invariance():
    xs, xlens = _x(t=63)
    enc = XformerEncoder(input_dim=20, btype="conformer", d_model=16,
                         d_ff=32, n_heads=2, n_layers=2, pe_type="relative",
                         conv_kernel_size=7, conv_channels="4_4",
                         conv_kernel_sizes="(3,3)_(3,3)",
                         conv_poolings="(2,2)_(2,2)",
                         chunk_size_left=16, chunk_size_current=16,
                         chunk_size_right=0, streaming_type="mask")
    v = enc.init(RNG, xs, xlens)
    e1 = enc.apply(v, xs, xlens)["ys"]
    e2 = enc.apply(v, _pad_t(xs, 33), xlens)["ys"]
    t1 = int(np.asarray(e1["xlens"]).max())
    np.testing.assert_allclose(np.asarray(e2["xs"][:, :t1]),
                               np.asarray(e1["xs"][:, :t1]),
                               rtol=2e-5, atol=2e-5)


def test_reshape_mode_prechunked_output_len():
    """ADVICE r4: reshape-mode pre-chunked outputs must stop at the true
    post-conv length ceil(t_raw/factor), not the chunk multiple."""
    xs, xlens = _x(t=63)
    enc = XformerEncoder(input_dim=20, btype="conformer", d_model=16,
                         d_ff=32, n_heads=2, n_layers=2, pe_type="relative",
                         conv_kernel_size=7, conv_channels="4_4",
                         conv_kernel_sizes="(3,3)_(3,3)",
                         conv_poolings="(2,2)_(2,2)",
                         chunk_size_left=16, chunk_size_current=16,
                         chunk_size_right=16, streaming_type="reshape")
    v = enc.init(RNG, xs, xlens)
    e = enc.apply(v, xs, xlens)["ys"]
    assert e["xs"].shape[1] == -(-63 // 4)
    assert int(np.asarray(e["xlens"]).max()) <= e["xs"].shape[1]
