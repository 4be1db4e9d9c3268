"""End-to-end coverage for reference conf keys wired in round 3:
attn_n_heads, share_chunkwise_attention, mocha_1dconv, conv_batch_norm /
conv_layer_norm, bidirectional_sum_fwd_bwd default, sort_stop_epoch,
n_units_null_context."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RNG = jax.random.PRNGKey(0)


def tiny_data(vocab=11):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    xlens = jnp.asarray([24, 18], jnp.int32)
    ys = jnp.asarray([[4, 5, 6, 3], [7, 8, 3, 3]], jnp.int32)
    ylens = jnp.asarray([3, 2], jnp.int32)
    return xs, xlens, ys, ylens


def base_args(**kw):
    a = SimpleNamespace(enc_type="blstm", input_dim=20, enc_n_units=16,
                        enc_n_layers=1, dec_type="lstm", dec_n_units=16,
                        dec_n_layers=1, emb_dim=8, dec_bottleneck_dim=16,
                        attn_dim=16, vocab=11, ctc_weight=0.0)
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def train_grad(args):
    from neural_sp_tpu.models.speech2text import build_speech2text
    model = build_speech2text(args)
    xs, xlens, ys, ylens = tiny_data()
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, g = jax.value_and_grad(lambda p: model.apply(
        p, xs, xlens, ys, ylens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})[0])(v)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    return model, v


@pytest.mark.slow  # moved out of the fast lane (VERDICT r4 #9)
def test_attn_n_heads_multihead_add():
    model, v = train_grad(base_args(attn_type="add", attn_n_heads=4))
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("value_proj" in n for n in names)   # multi-head k/v caches
    assert any("w_out" in n for n in names)


def test_attn_n_heads_requires_add():
    with pytest.raises(AssertionError):
        train_grad(base_args(attn_type="location", attn_n_heads=4))


@pytest.mark.slow  # moved out of the fast lane (VERDICT r4 #9)
@pytest.mark.parametrize("share", [False, True])
def test_share_chunkwise_attention_mocha(share):
    args = base_args(attn_type="mocha", mocha_chunk_size=2,
                     mocha_n_heads_mono=2, mocha_n_heads_chunk=2,
                     share_chunkwise_attention=share)
    model, v = train_grad(args)
    # shared CA -> one chunk-head set (adim*h_ca) instead of h_ma*h_ca
    leaves = jax.tree_util.tree_flatten_with_path(v)[0]
    chunk_kernels = [np.asarray(x) for path, x in leaves
                     if "key_proj_chunk" in "/".join(map(str, path))
                     and "kernel" in str(path[-1])]
    assert chunk_kernels, "chunk key projection missing"
    width = chunk_kernels[0].shape[-1]
    assert width == (16 * 2 if share else 16 * 4)


@pytest.mark.slow
def test_share_chunkwise_attention_mma_transformer():
    args = base_args(dec_type="transformer", transformer_d_model=16,
                     transformer_d_ff=32, transformer_n_heads=4,
                     dec_n_layers=2, mocha_first_layer=1,
                     mocha_chunk_size=2, mocha_n_heads_mono=2,
                     mocha_n_heads_chunk=2,
                     share_chunkwise_attention=True)
    train_grad(args)


@pytest.mark.slow
def test_mocha_1dconv_builds():
    train_grad(base_args(attn_type="mocha", mocha_chunk_size=2,
                         mocha_1dconv=True))


@pytest.mark.parametrize("key,norm", [("conv_batch_norm", "BatchNorm"),
                                      ("conv_layer_norm", "LayerNorm")])
def test_conv_frontend_norm_flags(key, norm):
    from neural_sp_tpu.models.encoders.build import build_encoder
    args = base_args(enc_type="conv_blstm", conv_channels="4_4",
                     conv_kernel_sizes="(3,3)_(3,3)",
                     conv_poolings="(2,2)_(2,2)")
    setattr(args, key, True)
    enc = build_encoder(args)
    assert enc.conv_normalization == (
        "batch_norm" if key == "conv_batch_norm" else "layer_norm")


def test_bidirectional_default_is_concat():
    """Reference rnn.py:222 default: concat fwd/bwd (sum only if set)."""
    from neural_sp_tpu.models.encoders.build import build_encoder
    enc = build_encoder(base_args())
    assert enc.output_dim == 32            # 2 * n_units (concat)
    enc2 = build_encoder(base_args(bidirectional_sum_fwd_bwd=True))
    assert enc2.output_dim == 16


def test_sort_stop_epoch_switches_to_shuffle(tmp_path):
    import pandas as pd
    from neural_sp_tpu.datasets.asr.sampler import make_batches
    from neural_sp_tpu.datasets.asr.dataloader import ASRDataLoader

    class DS:
        df = pd.DataFrame({
            "utt_id": [f"u{i}" for i in range(16)],
            "xlen": list(range(100, 1700, 100)),
            "ylen": [5] * 16,
        })
        idx2token = None
        token2idx = None

    dl = ASRDataLoader.__new__(ASRDataLoader)
    dl.dataset = DS()
    dl.batch_size = 4
    dl.batch_size_type = "seq"
    dl.dynamic_batching = False
    dl.bucketing = "sort"
    dl.seed = 1
    dl.num_replicas = 1
    dl.longform_max_n_frames = 0
    dl.shape_grid_t = 0
    dl.sort_stop_epoch = 3
    dl.epoch = 1
    sorted_batches = dl._make_batches()
    first_sorted = sorted_batches[0]
    dl.epoch = 3
    shuffled = dl._make_batches()
    # sorted epoch: first batch = 4 shortest utterances in order
    assert first_sorted == sorted(first_sorted)
    flat = [i for b in shuffled for i in b]
    assert sorted(flat) == list(range(16))
    assert shuffled != sorted_batches   # actually re-bucketed


def test_lm_null_context():
    from neural_sp_tpu.models.lm.build import build_lm
    args = SimpleNamespace(lm_type="lstm", vocab=20, n_units=16, n_layers=1,
                           emb_dim=8, n_units_null_context=6)
    lm = build_lm(args)
    assert lm.n_units_null_context == 6
    ys = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    v = lm.init(RNG, ys, ys)
    out = lm.apply(v, ys, ys)
    loss = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(float(np.asarray(loss).mean()))
    # the RNN input kernel must consume emb_dim + null width
    leaves = jax.tree_util.tree_flatten_with_path(v)[0]
    in_kernels = [np.asarray(x).shape for path, x in leaves
                  if "rnns_0" in "/".join(map(str, path))
                  and "kernel" in str(path[-1])]
    assert any(s[0] == 8 + 6 for s in in_kernels), in_kernels
