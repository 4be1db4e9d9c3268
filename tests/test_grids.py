"""Extra parametrized grids (reference test strategy, SURVEY.md §4):
config sweeps over variants not covered by the focused tests."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.models.encoders.transformer import XformerEncoder

# heavy lane (default CI deselects; run all with `-m ""`)
pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def _data(b=2, t=32, d=16, vocab=13, u=4, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    xlens = jnp.asarray([t, t - 7][:b], jnp.int32)
    ys = jnp.asarray(rng.integers(4, vocab, (b, u)), jnp.int32)
    ylens = jnp.asarray([u, u - 1][:b], jnp.int32)
    return xs, xlens, ys, ylens


@pytest.mark.parametrize("kw", [
    dict(dec_type="gru", dec_n_layers=2),                 # GRU decoder stack
    dict(dec_type="lstm", dec_n_layers=2, dec_n_projs=8),  # projections
    dict(attn_type="add"),
    dict(attn_type="gmm"),
    dict(enc_type="gru"),
    dict(enc_type="bgru", ss_prob=0.3),
])
def test_model_variant_grid(kw):
    base = dict(enc_type="blstm", input_dim=16, enc_n_units=12,
                enc_n_layers=1, dec_type="lstm", dec_n_units=12,
                dec_n_layers=1, emb_dim=8, dec_bottleneck_dim=12,
                attn_dim=12, attn_conv_width=9, vocab=13, ctc_weight=0.3,
                lsm_prob=0.1)
    base.update(kw)
    model = build_speech2text(SimpleNamespace(**base))
    xs, xlens, ys, ylens = _data()
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, obs = model.apply(v, xs, xlens, ys, ylens, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss)), kw


@pytest.mark.parametrize("btype,pe,n_r", [
    ("conformer_v2", "add", 0),
    ("conformer", "relative", 4),
    ("transformer", "relative", 4),
])
def test_streaming_chunkwise_grid(btype, pe, n_r):
    """Streaming-step chain runs and matches full mask-mode shape for every
    block/PE combination (exactness for n_r=0 is covered elsewhere)."""
    from neural_sp_tpu.frontends.streaming import StreamingDriver
    enc = XformerEncoder(input_dim=12, btype=btype, d_model=16, d_ff=32,
                         n_heads=2, n_layers=2, pe_type=pe,
                         conv_kernel_size=3, chunk_size_left=8,
                         chunk_size_current=4, chunk_size_right=n_r,
                         streaming_type="mask")
    t = 24
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((1, t, 12)),
                     jnp.float32)
    v = enc.init(RNG, xs, jnp.asarray([t]))
    full = enc.apply(v, xs, jnp.asarray([t]))["ys"]["xs"]
    cache = enc.init_stream_cache(1)
    total_in, hop_in = enc.block_input_frames()
    _, cnn_ctx, _, _, _ = enc.stream_geometry()
    outs = []
    for block, n_new, _ in StreamingDriver(np.asarray(xs[0]), total_in,
                                           hop_in, cnn_ctx):
        o, cache = enc.apply(v, jnp.asarray(block)[None], cache,
                             method=enc.streaming_step)
        outs.append(np.asarray(o)[:, :n_new])
    stream = np.concatenate(outs, axis=1)
    assert stream.shape == np.asarray(full).shape
    assert np.isfinite(stream).all()
    if n_r == 0 and not btype.startswith("conformer"):
        np.testing.assert_allclose(np.asarray(full), stream, rtol=1e-4,
                                   atol=1e-4)


def test_bf16_inputs_through_model():
    """bf16 feature inputs must not NaN the loss path."""
    base = dict(enc_type="blstm", input_dim=16, enc_n_units=12,
                enc_n_layers=1, dec_type="lstm", dec_n_units=12,
                dec_n_layers=1, emb_dim=8, dec_bottleneck_dim=12,
                attn_dim=12, attn_conv_width=9, vocab=13, ctc_weight=0.3)
    model = build_speech2text(SimpleNamespace(**base))
    xs, xlens, ys, ylens = _data()
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, _ = model.apply(v, xs.astype(jnp.bfloat16).astype(jnp.float32),
                          xlens, ys, ylens)
    assert np.isfinite(float(loss))


def test_lm_dataset_serialized_and_vocab():
    import pandas as pd
    from neural_sp_tpu.datasets.lm import LMDataset
    df = pd.DataFrame([
        {"utt_id": f"s{j}_{i:02d}", "text": "a b a", "token_id": "4 5 4",
         "ylen": 3} for j in range(2) for i in range(6)])
    import tempfile, os
    d = tempfile.mkdtemp()
    tsv = os.path.join(d, "lm.tsv")
    df.to_csv(tsv, sep="\t", index=False)
    dict_path = os.path.join(d, "dict.txt")
    open(dict_path, "w").write("a 4\nb 5\n")
    ds = LMDataset(tsv, dict_path, unit="word", batch_size=2, bptt=4,
                   serialize=True)
    assert ds.vocab == 6
    xi, xo = next(iter(ds))
    assert xi.shape == (2, 4)


def test_epoch_controller_early_stop_and_topk():
    from neural_sp_tpu.trainers.lr_scheduler import EpochController
    c = EpochController(base_lr=1.0, decay_type="metric", decay_rate=0.5,
                        decay_patient_n_epochs=0,
                        early_stop_patient_n_epochs=2)
    a1 = c.step_epoch(10.0)
    assert a1["is_best"] and a1["lr"] == 1.0
    a2 = c.step_epoch(11.0)   # worse -> decay
    assert a2["lr"] == 0.5 and not a2["early_stop"]
    a3 = c.step_epoch(12.0)   # worse again -> early stop
    assert a3["early_stop"]
    assert c.topk_epochs(2) == [1, 2]
    # state roundtrip
    st = c.state_dict()
    c2 = EpochController(base_lr=1.0)
    c2.load_state_dict(st)
    assert c2.best_value == 10.0 and c2.epoch == 3


def test_mesh_data_parallel_step_matches_single_device():
    """The 8-device mesh step must produce the same loss trajectory as the
    single-device step (DP is arithmetic-invariant)."""
    import optax
    from neural_sp_tpu.parallel.mesh import (
        make_mesh, make_train_step, shard_batch, replicated)
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    base = dict(enc_type="blstm", input_dim=16, enc_n_units=12,
                enc_n_layers=1, dec_type="lstm", dec_n_units=12,
                dec_n_layers=1, emb_dim=8, dec_bottleneck_dim=12,
                attn_dim=12, attn_conv_width=9, vocab=13, ctc_weight=1.0,
                dropout_enc=0.0, dropout_dec=0.0)
    model = build_speech2text(SimpleNamespace(**base))
    rng = np.random.default_rng(0)
    bs = 8
    xs = jnp.asarray(rng.standard_normal((bs, 32, 16)), jnp.float32)
    xlens = jnp.full((bs,), 32, jnp.int32)
    ys = jnp.asarray(rng.integers(4, 13, (bs, 4)), jnp.int32)
    ylens = jnp.full((bs,), 4, jnp.int32)
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = build_optimizer("adam", lr=1e-3)

    # single device
    step1 = make_train_step(model, tx, None, donate=False)
    p1, o1, m1 = step1(v["params"], tx.init(v["params"]),
                       jax.random.PRNGKey(0), xs, xlens, ys, ylens)

    # 8-device mesh
    mesh = make_mesh(n_data=8)
    p_r = jax.device_put(v["params"], replicated(mesh))
    o_r = jax.device_put(tx.init(v["params"]), replicated(mesh))
    step8 = make_train_step(model, tx, mesh, donate=False)
    b = shard_batch({"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens},
                    mesh)
    p8, o8, m8 = step8(p_r, o_r, jax.random.PRNGKey(0),
                       b["xs"], b["xlens"], b["ys"], b["ylens"])
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    # updated params agree across the sharded/unsharded paths
    d = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()), p1, p8)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_train_step_lr_scale_applies():
    """Epoch-level lr decay reaches the jitted step via the lr_scale arg
    (regression: controller decay used to be a silent no-op)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.parallel.mesh import make_train_step
    from neural_sp_tpu.trainers.optimizer import build_optimizer

    args = SimpleNamespace(
        enc_type="blstm", input_dim=8, enc_n_units=12, enc_n_layers=1,
        dec_type="lstm", dec_n_units=12, dec_n_layers=1, emb_dim=8,
        dec_bottleneck_dim=12, attn_dim=12, attn_conv_width=9, vocab=11,
        ctc_weight=0.0, lsm_prob=0.0, dropout_enc=0.0, dropout_dec=0.0)
    model = build_speech2text(args)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    xlens = jnp.full((2,), 16, jnp.int32)
    ys = jnp.asarray(rng.integers(4, 11, (2, 5)), jnp.int32)
    ylens = jnp.full((2,), 5, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)["params"]
    tx = build_optimizer("sgd", lr=0.1, clip_grad_norm=0.0)
    step = make_train_step(model, tx, None, donate=False)
    key = jax.random.PRNGKey(1)

    p_full, _, _ = step(params, tx.init(params), key, xs, xlens, ys, ylens,
                        1.0)
    p_half, _, _ = step(params, tx.init(params), key, xs, xlens, ys, ylens,
                        0.5)
    d_full = jax.tree.map(lambda a, b: np.asarray(a - b), p_full, params)
    d_half = jax.tree.map(lambda a, b: np.asarray(a - b), p_half, params)
    for df, dh in zip(jax.tree.leaves(d_full), jax.tree.leaves(d_half)):
        np.testing.assert_allclose(dh, 0.5 * df, rtol=1e-5, atol=1e-7)


def test_mesh_tensor_parallel_step_matches_single_device():
    """DP x TP mesh (4 data x 2 model): large kernels tensor-sharded over
    `model` (param_shardings), the rest replicated — the training step must
    match the single-device trajectory (TP is arithmetic-invariant up to
    reduction order)."""
    import optax
    from neural_sp_tpu.parallel.mesh import (
        make_mesh, make_train_step, shard_batch, replicated,
        param_shardings)
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    base = dict(enc_type="blstm", input_dim=16, enc_n_units=64,
                enc_n_layers=1, dec_type="lstm", dec_n_units=64,
                dec_n_layers=1, emb_dim=32, dec_bottleneck_dim=64,
                attn_dim=32, attn_conv_width=9, vocab=32, ctc_weight=1.0,
                dropout_enc=0.0, dropout_dec=0.0)
    model = build_speech2text(SimpleNamespace(**base))
    rng = np.random.default_rng(0)
    bs = 8
    xs = jnp.asarray(rng.standard_normal((bs, 32, 16)), jnp.float32)
    xlens = jnp.full((bs,), 32, jnp.int32)
    ys = jnp.asarray(rng.integers(4, 32, (bs, 4)), jnp.int32)
    ylens = jnp.full((bs,), 4, jnp.int32)
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = build_optimizer("adam", lr=1e-3)

    step1 = make_train_step(model, tx, None, donate=False)
    p1, o1, m1 = step1(v["params"], tx.init(v["params"]),
                       jax.random.PRNGKey(0), xs, xlens, ys, ylens)

    mesh = make_mesh(n_data=4, n_model=2)
    tp = param_shardings(v["params"], mesh, min_size=1024)
    # at least one kernel must actually shard over `model`
    n_sharded = sum(
        1 for s in jax.tree.leaves(tp)
        if "model" in str(s.spec))
    assert n_sharded > 0, "TP heuristic sharded nothing"
    p_tp = jax.device_put(v["params"], tp)
    o_tp = tx.init(p_tp)
    step_tp = make_train_step(model, tx, mesh, donate=False, tp_params=tp)
    b = shard_batch({"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens},
                    mesh)
    p2, o2, m2 = step_tp(p_tp, o_tp, jax.random.PRNGKey(0),
                         b["xs"], b["xlens"], b["ys"], b["ylens"])
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    d = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()), p1, p2)
    assert max(jax.tree.leaves(d)) < 1e-4


def test_tp_paired_column_row_conformer_bit_exact():
    """Megatron-style paired TP on a conformer block stack: FFN w1/attn
    qkv column-sharded, w2/w_out row-sharded (parallel/mesh.py rules), and
    the TP=2 step matches single-device within float tolerance."""
    from neural_sp_tpu.parallel.mesh import (
        make_mesh, make_train_step, shard_batch, param_shardings,
        collective_stats, _path_names, _TP_COLUMN, _TP_ROW)
    from neural_sp_tpu.trainers.optimizer import build_optimizer

    base = dict(enc_type="conformer", input_dim=16,
                transformer_d_model=32, transformer_d_ff=64,
                transformer_n_heads=2, enc_n_layers=2,
                transformer_enc_pe_type="relative",
                conformer_kernel_size=3, dec_type="lstm", dec_n_units=32,
                dec_n_layers=1, emb_dim=16, dec_bottleneck_dim=32,
                attn_dim=32, attn_conv_width=9, vocab=32, ctc_weight=0.3,
                dropout_enc=0.0, dropout_dec=0.0, dropout_att=0.0)
    model = build_speech2text(SimpleNamespace(**base))
    rng = np.random.default_rng(1)
    bs = 8
    xs = jnp.asarray(rng.standard_normal((bs, 24, 16)), jnp.float32)
    xlens = jnp.full((bs,), 24, jnp.int32)
    ys = jnp.asarray(rng.integers(4, 32, (bs, 4)), jnp.int32)
    ylens = jnp.full((bs,), 4, jnp.int32)
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = build_optimizer("adam", lr=1e-3)

    mesh = make_mesh(n_data=4, n_model=2)
    tp = param_shardings(v["params"], mesh, min_size=256)
    # the paired layout must produce BOTH column and row shardings
    col = row = 0
    import jax as _jax
    flat = _jax.tree_util.tree_flatten_with_path(tp)[0]
    for path, s in flat:
        spec = tuple(s.spec)
        names = _path_names(path)
        if spec and spec[-1] == "model" and (not spec[0] == "model"):
            col += 1
            assert names[-2] in _TP_COLUMN + ("depthwise",), names
        elif spec and spec[0] == "model":
            row += 1
            assert names[-2] in _TP_ROW, names
    assert col > 0 and row > 0, (col, row)

    step1 = make_train_step(model, tx, None, donate=False)
    p1, _, m1 = step1(v["params"], tx.init(v["params"]),
                      jax.random.PRNGKey(0), xs, xlens, ys, ylens)

    p_tp = jax.device_put(v["params"], tp)
    step_tp = make_train_step(model, tx, mesh, donate=False, tp_params=tp)
    b = shard_batch({"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens},
                    mesh)
    p2, _, m2 = step_tp(p_tp, tx.init(p_tp), jax.random.PRNGKey(0),
                        b["xs"], b["xlens"], b["ys"], b["ylens"])
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    d = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()), p1, p2)
    # row-sharded contractions change the psum reduction order; adam's
    # rsqrt normaliser amplifies that for near-zero-grad params — compare
    # at 1e-3 (~= one lr step)
    assert max(jax.tree.leaves(d)) < 1e-3
