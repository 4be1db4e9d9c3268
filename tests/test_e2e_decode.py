"""End-to-end train -> decode -> score on the synthetic corpus: the
framework's analog of the reference's test_training.sh CI recipe."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.models.decoders.decoding import (
    Speech2TextSession, DecodeConfig)
from neural_sp_tpu.trainers.optimizer import build_optimizer
from neural_sp_tpu.evaluators.asr import eval_char

# heavy end-to-end lane (default CI deselects via pytest.ini addopts; run all with `-m ""`)
pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    root = tmp_path_factory.mktemp("e2e")
    return make_ci_corpus(str(root), n_train=16, n_dev=6, n_test=6,
                          max_words=3, seed=5)


def _train(corpus, args_kw, n_steps=300, lr=3e-3):
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    loader = build_dataloader(corpus["train"], corpus["dict_char"],
                              unit="char", batch_size=16, bucketing="sort",
                              pad_xlen_multiple=512, pad_ylen_multiple=16)
    base = dict(enc_type="blstm", input_dim=80, enc_n_units=32,
                enc_n_layers=2, dec_type="lstm", dec_n_units=32,
                dec_n_layers=1, emb_dim=16, dec_bottleneck_dim=32,
                attn_dim=32, attn_conv_width=9, vocab=loader.vocab,
                ctc_weight=0.3, lsm_prob=0.0)
    base.update(args_kw)
    args = SimpleNamespace(**base)
    model = build_speech2text(args)
    batch = next(iter(loader))
    xs, xlens = jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"])
    ys, ylens = jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"])
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = build_optimizer("adam", lr=lr)
    opt_state = tx.init(v["params"])

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, xs, xlens, ys, ylens)[0])(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = v["params"]
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    return model, params, loader, float(loss)


@pytest.fixture(scope="module")
def las_model(corpus):
    return _train(corpus, dict(ctc_weight=0.3))


def _dev_loader(corpus):
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    return build_dataloader(corpus["dev"], corpus["dict_char"], unit="char",
                            batch_size=6, bucketing="sort", is_test=True,
                            pad_xlen_multiple=512, pad_ylen_multiple=16)


@pytest.mark.slow
def test_ctc_greedy_and_beam(corpus, las_model):
    model, params, loader, loss = las_model
    sess = Speech2TextSession(model, params,
                              DecodeConfig(beam_width=4, ctc_weight=1.0))
    dev = _dev_loader(corpus)
    batch = next(iter(dev))
    g = sess.decode_ctc_greedy(batch["xs"], batch["xlens"])
    b = sess.decode_ctc_beam(batch["xs"], batch["xlens"])
    assert len(g) == len(b) == len(batch["utt_ids"])
    # beam with width 1 == greedy collapse on at least most utts
    sess1 = Speech2TextSession(model, params, DecodeConfig(beam_width=1))
    b1 = sess1.decode_ctc_beam(batch["xs"], batch["xlens"])
    n_same = sum(x == y for x, y in zip(g, b1))
    assert n_same >= len(g) - 1, (g, b1)


@pytest.mark.slow
def test_attention_greedy_vs_beam1(corpus, las_model):
    model, params, loader, _ = las_model
    dev = _dev_loader(corpus)
    batch = next(iter(dev))
    g = Speech2TextSession(
        model, params, DecodeConfig(beam_width=1)).decode_attention_greedy(
        batch["xs"], batch["xlens"])
    b1 = Speech2TextSession(
        model, params,
        DecodeConfig(beam_width=1, eos_threshold=10.0)).decode_attention_beam(
        batch["xs"], batch["xlens"])
    n_same = sum(x == y for x, y in zip(g, b1))
    assert n_same >= len(g) - 2, list(zip(g, b1))


@pytest.mark.slow
def test_eval_char_wer(corpus, las_model, tmp_path):
    model, params, loader, _ = las_model
    sess = Speech2TextSession(
        model, params,
        DecodeConfig(beam_width=4, ctc_weight=0.3, length_norm=True))
    dev = _dev_loader(corpus)
    metrics = eval_char(sess, dev, save_dir=str(tmp_path))
    assert metrics["n_utts"] == 6
    assert metrics["wer"] < 60.0, metrics   # tiny model, tiny corpus
    assert (tmp_path / "hyp.trn").exists()
    assert metrics["rtf"] > 0


@pytest.mark.slow
def test_transducer_greedy(corpus):
    model, params, loader, loss = _train(
        corpus, dict(dec_type="lstm_transducer", ctc_weight=0.0,
                     dec_n_units=32, transducer_joint_dim=32), n_steps=250)
    sess = Speech2TextSession(model, params, DecodeConfig())
    dev = _dev_loader(corpus)
    batch = next(iter(dev))
    hyps = sess.decode_transducer_greedy(batch["xs"], batch["xlens"])
    assert len(hyps) == len(batch["utt_ids"])
    # the model should emit a nonempty hypothesis for most utts
    assert sum(len(h) > 0 for h in hyps) >= 4, hyps


@pytest.mark.slow
def test_transformer_decoder_beam(corpus):
    model, params, loader, _ = _train(
        corpus, dict(dec_type="transformer", transformer_d_model=32,
                     transformer_d_ff=64, transformer_n_heads=2,
                     dec_n_layers=2, ctc_weight=0.3), n_steps=250)
    sess = Speech2TextSession(
        model, params, DecodeConfig(beam_width=4, ctc_weight=0.3,
                                    length_norm=True))
    dev = _dev_loader(corpus)
    batch = next(iter(dev))
    hyps = sess.decode_attention_beam(batch["xs"], batch["xlens"])
    assert len(hyps) == len(batch["utt_ids"])
    assert sum(len(h) > 0 for h in hyps) >= 4, hyps


def test_device_beam_matches_host_beam():
    """Fully on-device batched beam (one jit dispatch for the whole batch)
    reproduces the host session beam when no fusion features are active
    (SURVEY §7 fixed-beam-tensor search)."""
    from types import SimpleNamespace
    import optax
    from neural_sp_tpu.models.speech2text import build_speech2text
    from neural_sp_tpu.models.decoders.decoding import (
        Speech2TextSession, DecodeConfig)
    args = SimpleNamespace(
        enc_type="blstm", enc_n_units=24, enc_n_layers=1, input_dim=80,
        dec_type="lstm", dec_n_units=24, dec_n_layers=1, emb_dim=12,
        dec_bottleneck_dim=24, attn_type="location", attn_dim=24,
        attn_conv_width=9, vocab=19, ctc_weight=0.0, lsm_prob=0.0)
    model = build_speech2text(args)

    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    import tempfile
    from neural_sp_tpu.datasets.asr.build import build_dataloader
    root = tempfile.mkdtemp()
    paths = make_ci_corpus(root, n_train=8, n_dev=2, n_test=2, max_words=2,
                           seed=5)
    loader = build_dataloader(paths["train"], paths["dict_char"],
                              unit="char", batch_size=8,
                              pad_xlen_multiple=512, pad_ylen_multiple=16)
    batch = next(iter(loader))
    xs, xlens = jnp.asarray(batch["xs"]), jnp.asarray(batch["xlens"])
    ys, ylens = jnp.asarray(batch["ys"]), jnp.asarray(batch["ylens"])
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = optax.adam(3e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(lambda p: model.apply(
            {"params": p}, xs, xlens, ys, ylens)[0])(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    p = v["params"]
    for _ in range(120):
        p, opt, _ = step(p, opt)

    sess = Speech2TextSession(model, p, DecodeConfig(beam_width=4))
    host = sess.decode_attention_beam(batch["xs"], batch["xlens"])
    dev = sess.decode_attention_beam_device(batch["xs"], batch["xlens"])
    n_match = sum(h == d for h, d in zip(host, dev))
    # identical search space; allow one edge-case divergence from the host
    # early-stop heuristic
    assert n_match >= len(host) - 1, (host, dev)
    # dispatch honours the device_beam flag
    sess2 = Speech2TextSession(
        model, p, DecodeConfig(beam_width=4, device_beam=True))
    via_decode = sess2.decode(batch["xs"], batch["xlens"])
    assert via_decode == dev
