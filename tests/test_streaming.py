"""Streaming subsystem: encoder step-vs-full equivalence, block extraction,
CTC-VAD, block-sync beam, end-to-end streaming decode."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.models.encoders.transformer import XformerEncoder
from neural_sp_tpu.frontends.streaming import (
    StreamingDriver, ctc_reset_point_detection)
from neural_sp_tpu.frontends.frame_stacking import stack_frame
from neural_sp_tpu.frontends.splicing import splice
from neural_sp_tpu.frontends.sequence_summary import SequenceSummaryNetwork

# heavy end-to-end lane (default CI deselects via pytest.ini addopts; run all with `-m ""`)
pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def test_frame_stacking_and_splicing():
    x = np.arange(12, dtype=np.float32).reshape(6, 2)
    s = stack_frame(x, 3, 3)
    assert s.shape == (2, 6)
    np.testing.assert_array_equal(s[0], [0, 1, 2, 3, 4, 5])
    sp = splice(x, 1)
    assert sp.shape == (6, 6)
    np.testing.assert_array_equal(sp[0], [0, 1, 0, 1, 2, 3])  # edge clamp


def test_sequence_summary_network():
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 8)),
                     jnp.float32)
    ssn = SequenceSummaryNetwork(n_units=16, n_layers=3)
    v = ssn.init(RNG, xs, jnp.asarray([10, 6]))
    out = ssn.apply(v, xs, jnp.asarray([10, 6]))
    assert out.shape == xs.shape


def test_streaming_driver_blocks():
    x = np.arange(50, dtype=np.float32)[:, None] * np.ones((1, 3))
    drv = StreamingDriver(x, block_total_in=16, block_hop_in=8, cnn_ctx_in=4)
    blocks = list(drv)
    assert len(blocks) == -(-50 // 8)
    b0, n0, last0 = blocks[0]
    assert b0.shape == (16, 3) and n0 == 8 and not last0
    # first block: cnn ctx zero-padded
    assert (b0[:4] == 0).all() and b0[4, 0] == 0.0 and b0[5, 0] == 1.0
    b1, _, _ = blocks[1]
    assert b1[4, 0] == 8.0  # second block current starts at frame 8
    assert blocks[-1][2]


def test_ctc_vad_reset():
    ids = np.asarray([0] * 10 + [5] + [0] * 50)
    ok, bd = ctc_reset_point_detection(ids, blank_threshold=30,
                                       n_accum_frames=2000,
                                       min_accum_frames=100)
    assert ok and bd >= 40
    ok2, _ = ctc_reset_point_detection(ids, blank_threshold=30,
                                       n_accum_frames=10,
                                       min_accum_frames=100)
    assert not ok2
    ok3, _ = ctc_reset_point_detection(np.zeros(100, np.int64),
                                       blank_threshold=30,
                                       n_accum_frames=2000,
                                       min_accum_frames=100)
    assert not ok3  # all blank, no spike


@pytest.mark.parametrize("btype,pe", [("transformer", "add"),
                                      ("transformer", "relative")])
def test_streaming_step_matches_full_mask_mode(btype, pe):
    """Cached streaming_step chain == full `mask`-mode forward when the
    lookahead is 0 (exact per-layer context identity)."""
    n_l, n_c, n_r = 8, 4, 0
    enc = XformerEncoder(input_dim=12, btype=btype, d_model=16, d_ff=32,
                         n_heads=2, n_layers=2, pe_type=pe,
                         chunk_size_left=n_l, chunk_size_current=n_c,
                         chunk_size_right=n_r, streaming_type="mask",
                         unidirectional=False)
    t = 24
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((1, t, 12)),
                     jnp.float32)
    xlens = jnp.asarray([t])
    v = enc.init(RNG, xs, xlens)
    full = enc.apply(v, xs, xlens)["ys"]["xs"]

    cache = enc.init_stream_cache(1)
    total_in, hop_in = enc.block_input_frames()
    _, cnn_ctx, _, _, _ = enc.stream_geometry()
    outs = []
    drv = StreamingDriver(np.asarray(xs[0]), total_in, hop_in, cnn_ctx)
    for block, n_new, _ in drv:
        o, cache = enc.apply(v, jnp.asarray(block)[None], cache,
                             method=enc.streaming_step)
        outs.append(np.asarray(o)[:, :n_new])
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), stream, rtol=1e-4,
                               atol=1e-4)


def test_streaming_step_conformer_runs():
    enc = XformerEncoder(input_dim=12, btype="conformer", d_model=16,
                         d_ff=32, n_heads=2, n_layers=2, pe_type="relative",
                         conv_kernel_size=3, unidirectional=True,
                         chunk_size_left=8, chunk_size_current=4,
                         chunk_size_right=4)
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 12)),
                     jnp.float32)
    v = enc.init(RNG, xs, jnp.asarray([32]))
    cache = enc.init_stream_cache(1)
    total_in, hop_in = enc.block_input_frames()
    _, cnn_ctx, _, _, _ = enc.stream_geometry()
    drv = StreamingDriver(np.asarray(xs[0]), total_in, hop_in, cnn_ctx)
    outs = []
    for block, n_new, _ in drv:
        o, cache = enc.apply(v, jnp.asarray(block)[None], cache,
                             method=enc.streaming_step)
        outs.append(np.asarray(o)[:, :n_new])
    stream = np.concatenate(outs, axis=1)
    assert stream.shape == (1, 32, 16) and np.isfinite(stream).all()


def test_streaming_step_with_conv_frontend():
    enc = XformerEncoder(input_dim=12, btype="transformer", d_model=16,
                         d_ff=32, n_heads=2, n_layers=1, pe_type="relative",
                         conv_channels="4_4", conv_kernel_sizes="(3,3)_(3,3)",
                         conv_poolings="(2,2)_(2,2)",
                         chunk_size_left=16, chunk_size_current=8,
                         chunk_size_right=0)
    xs = jnp.asarray(np.random.default_rng(1).standard_normal((1, 40, 12)),
                     jnp.float32)
    v = enc.init(RNG, xs, jnp.asarray([40]))
    cache = enc.init_stream_cache(1)
    total_in, hop_in = enc.block_input_frames()
    _, cnn_ctx, _, n_c, _ = enc.stream_geometry()
    assert hop_in == 8 and n_c == 2
    drv = StreamingDriver(np.asarray(xs[0]), total_in, hop_in, cnn_ctx)
    outs = []
    for block, n_new, _ in drv:
        o, cache = enc.apply(v, jnp.asarray(block)[None], cache,
                             method=enc.streaming_step)
        outs.append(np.asarray(o)[:, : -(-n_new // 4)])
    stream = np.concatenate(outs, axis=1)
    assert stream.shape == (1, 10, 16) and np.isfinite(stream).all()


@pytest.mark.slow
def test_decode_streaming_end_to_end():
    """Train a tiny streaming CTC model and decode with the block-sync
    pipeline; hypothesis should match offline CTC beam on most utts."""
    from types import SimpleNamespace
    import optax
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)

    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=80, enc_n_layers=2,
        transformer_d_model=32, transformer_d_ff=64, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=16,
        lc_chunk_size_current=8, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", vocab=19, ctc_weight=1.0)
    model = build_speech2text(args)

    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    import tempfile
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    root = tempfile.mkdtemp()
    paths = make_ci_corpus(root, n_train=12, n_dev=3, n_test=3, max_words=2,
                           seed=11)
    loader = build_dataloader(paths["train"], paths["dict_char"], unit="char",
                              batch_size=12, pad_xlen_multiple=512,
                              pad_ylen_multiple=16)
    batch = next(iter(loader))
    xs, xlens = jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"])
    ys, ylens = jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"])
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = optax.adam(3e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, xs, xlens, ys, ylens)[0])(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    p = v["params"]
    for _ in range(150):
        p, opt, loss = step(p, opt)

    sess = Speech2TextSession(model, p, DecodeConfig(beam_width=4))
    feats = np.load(loader.dataset.df["feat_path"].iloc[0])
    hyp_stream, stats = sess.decode_streaming(feats)
    # offline decode of the same utterance
    off = sess.decode_ctc_beam(feats[None], np.asarray([len(feats)]))
    assert stats["n_frames"] == len(feats)
    assert len(hyp_stream) > 0
    # streaming and offline agree on the trained utterance
    assert hyp_stream == off[0], (hyp_stream, off[0])


def test_decode_streaming_device_matches_greedy():
    """On-device whole-stream scan == block-loop greedy collapse."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=12, enc_n_layers=2,
        transformer_d_model=16, transformer_d_ff=32, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=8,
        lc_chunk_size_current=4, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", vocab=9, ctc_weight=1.0)
    model = build_speech2text(args)
    x = np.random.default_rng(0).standard_normal((30, 12)).astype(np.float32)
    v = model.init(RNG, jnp.asarray(x)[None], jnp.asarray([30]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    sess = Speech2TextSession(model, v["params"], DecodeConfig(beam_width=1))
    hyp_dev, stats = sess.decode_streaming_device(x)
    # offline greedy over the streaming (mask-mode) encoder == device scan
    off = sess.decode_ctc_greedy(x[None], np.asarray([30]))
    assert stats["n_frames"] == 30
    assert hyp_dev == off[0], (hyp_dev, off[0])


def test_decode_streaming_attention_mocha_beam():
    """Block-synchronous MoChA attention beam (reference
    las.py:1492-1706) reproduces the OFFLINE hard-MoChA beam bit-for-bit:
    the streaming path keeps the full accumulated encoder buffer, so with
    an always-firing monotonic energy (init_r=+4) both searches see
    identical boundaries and scores."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)

    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=80, enc_n_layers=2,
        transformer_d_model=32, transformer_d_ff=64, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=16,
        lc_chunk_size_current=8, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=32, dec_n_layers=1, emb_dim=16,
        dec_bottleneck_dim=32, attn_type="mocha", attn_dim=32,
        mocha_chunk_size=4, vocab=19, ctc_weight=0.0, lsm_prob=0.0,
        mocha_init_r=4.0)
    model = build_speech2text(args)
    feats = np.random.default_rng(3).standard_normal(
        (42, 80)).astype(np.float32)
    v = model.init(RNG, jnp.asarray(feats)[None], jnp.asarray([42]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    sess = Speech2TextSession(
        model, v["params"],
        DecodeConfig(beam_width=4, max_len_ratio=0.3))
    hyp_stream, stats = sess.decode_streaming(feats)
    assert stats["n_frames"] == len(feats)
    assert len(hyp_stream) > 0
    assert len(stats["boundaries"]) == len(hyp_stream)
    # boundaries must be monotonically non-decreasing (hard MoChA)
    assert all(b2 >= b1 for b1, b2 in
               zip(stats["boundaries"], stats["boundaries"][1:]))
    # offline hard-MoChA beam over the same (mask-mode) encoder
    off = sess.decode_attention_beam(feats[None], np.asarray([len(feats)]))
    assert hyp_stream == off[0], (hyp_stream, off[0])


def test_decode_streaming_attention_parks_without_boundary():
    """Untrained monotonic energy (init_r=-4) never fires: every
    hypothesis is parked block after block (reference hyps_nobd,
    las.py:1534-1560) and the stream ends with an empty transcript —
    no crash, no spurious tokens."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=12, enc_n_layers=1,
        transformer_d_model=16, transformer_d_ff=32, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=8,
        lc_chunk_size_current=4, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=16, dec_n_layers=1, emb_dim=8,
        dec_bottleneck_dim=16, attn_type="mocha", attn_dim=16,
        mocha_chunk_size=1, vocab=9, ctc_weight=0.0, mocha_init_r=-30.0)
    model = build_speech2text(args)
    x = np.random.default_rng(0).standard_normal((24, 12)).astype(np.float32)
    v = model.init(RNG, jnp.asarray(x)[None], jnp.asarray([24]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    sess = Speech2TextSession(model, v["params"], DecodeConfig(beam_width=3))
    hyp, stats = sess.decode_streaming(x)
    assert hyp == []
    assert stats["boundaries"] == []


def test_decode_streaming_attention_with_ctc_and_lm():
    """Streaming MoChA beam composes with joint CTC prefix scoring across
    chunks (extend_state) — smoke: runs, returns a finite-score hyp."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=12, enc_n_layers=1,
        transformer_d_model=16, transformer_d_ff=32, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=8,
        lc_chunk_size_current=4, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=16, dec_n_layers=1, emb_dim=8,
        dec_bottleneck_dim=16, attn_type="mocha", attn_dim=16,
        mocha_chunk_size=2, vocab=9, ctc_weight=0.3)
    model = build_speech2text(args)
    x = np.random.default_rng(0).standard_normal((40, 12)).astype(np.float32)
    v = model.init(RNG, jnp.asarray(x)[None], jnp.asarray([40]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    sess = Speech2TextSession(
        model, v["params"], DecodeConfig(beam_width=3, ctc_weight=0.3))
    hyp, stats = sess.decode_streaming(x)
    assert isinstance(hyp, list)
    assert stats["n_out_frames"] == 40


def test_decode_streaming_attention_device_matches_host():
    """Device-resident block-sync MoChA beam (one jit dispatch, in-graph
    parking) reproduces the host-orchestrated block-sync beam on an
    always-firing model (las.py:1492-1706 semantics)."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)

    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=80, enc_n_layers=2,
        transformer_d_model=32, transformer_d_ff=64, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=16,
        lc_chunk_size_current=8, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=32, dec_n_layers=1, emb_dim=16,
        dec_bottleneck_dim=32, attn_type="mocha", attn_dim=32,
        mocha_chunk_size=4, vocab=19, ctc_weight=0.0, lsm_prob=0.0,
        mocha_init_r=4.0)
    model = build_speech2text(args)
    feats = np.random.default_rng(7).standard_normal(
        (42, 80)).astype(np.float32)
    v = model.init(RNG, jnp.asarray(feats)[None], jnp.asarray([42]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))

    sess_host = Speech2TextSession(
        model, v["params"],
        DecodeConfig(beam_width=4, max_len_ratio=0.3, device_beam=False))
    hyp_host, stats_host = sess_host.decode_streaming(feats)

    sess_dev = Speech2TextSession(
        model, v["params"],
        DecodeConfig(beam_width=4, max_len_ratio=0.3, device_beam=True))
    hyp_dev, stats_dev = sess_dev.decode_streaming(feats)
    assert hyp_dev == hyp_host, (hyp_dev, hyp_host)
    assert stats_dev["boundaries"] == stats_host["boundaries"]


def test_decode_streaming_attention_device_parks_without_boundary():
    """init_r very negative: no boundary ever fires on-device — the beam
    must park every block and return an empty hypothesis (no crash)."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)

    args = SimpleNamespace(
        enc_type="uni_transformer", input_dim=80, enc_n_layers=1,
        transformer_d_model=32, transformer_d_ff=64, transformer_n_heads=2,
        transformer_enc_pe_type="relative", lc_chunk_size_left=16,
        lc_chunk_size_current=8, lc_chunk_size_right=0, lc_type="mask",
        dec_type="lstm", dec_n_units=32, dec_n_layers=1, emb_dim=16,
        dec_bottleneck_dim=32, attn_type="mocha", attn_dim=32,
        mocha_chunk_size=1, vocab=19, ctc_weight=0.0,
        mocha_init_r=-30.0)
    model = build_speech2text(args)
    feats = np.random.default_rng(8).standard_normal(
        (26, 80)).astype(np.float32)
    v = model.init(RNG, jnp.asarray(feats)[None], jnp.asarray([26]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    sess = Speech2TextSession(
        model, v["params"],
        DecodeConfig(beam_width=2, device_beam=True))
    hyp, stats = sess.decode_streaming(feats)
    assert hyp == []
