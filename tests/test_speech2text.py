"""Speech2Text task model: MTL forward variants + end-to-end overfit on the
synthetic ci corpus (the reference's ci_test analog, SURVEY.md §4)."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from neural_sp_tpu.models.speech2text import build_speech2text
from neural_sp_tpu.models.decoders.ctc import ctc_greedy
from neural_sp_tpu.trainers.optimizer import build_optimizer

# heavy end-to-end lane (default CI deselects via pytest.ini addopts; run all with `-m ""`)
pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def _batch(b=2, t=50, d=20, u=6, vocab=12, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    xlens = jnp.asarray([t, t - 13], jnp.int32)
    ys = jnp.asarray(rng.integers(4, vocab, (b, u)), jnp.int32)
    ylens = jnp.asarray([u, u - 2], jnp.int32)
    ys = jnp.where(jnp.arange(u)[None] < ylens[:, None], ys, 3)
    return xs, xlens, ys, ylens


def _args(**kw):
    base = dict(enc_type="blstm", input_dim=20, enc_n_units=16, enc_n_layers=2,
                dec_type="lstm", dec_n_units=16, dec_n_layers=1, emb_dim=8,
                dec_bottleneck_dim=16, attn_dim=16, attn_conv_width=9,
                vocab=12, ctc_weight=0.3, lsm_prob=0.1)
    base.update(kw)
    return SimpleNamespace(**base)


@pytest.mark.parametrize("kw", [
    dict(ctc_weight=1.0),                                    # CTC only
    dict(ctc_weight=0.0),                                    # attention only
    dict(ctc_weight=0.3),                                    # joint
    dict(ctc_weight=0.3, bwd_weight=0.3),                    # fwd+bwd
    dict(dec_type="lstm_transducer", ctc_weight=0.0),        # RNN-T
    dict(dec_type="transformer", transformer_d_model=16,
         transformer_d_ff=32, transformer_n_heads=2, dec_n_layers=2,
         ctc_weight=0.3),                                    # transformer dec
    dict(enc_type="transformer", transformer_d_model=16,
         transformer_d_ff=32, transformer_n_heads=2, enc_n_layers=2,
         ctc_weight=0.3),                                    # transformer enc
])
def test_s2t_forward_variants(kw):
    args = _args(**kw)
    model = build_speech2text(args)
    xs, xlens, ys, ylens = _batch()
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, obs = model.apply(v, xs, xlens, ys, ylens)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda p: model.apply(p, xs, xlens, ys, ylens)[0])(v)
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
    # at least some parameter receives gradient
    assert max(float(jnp.abs(x).max()) for x in flat) > 0


def test_s2t_mtl_subtasks():
    args = _args(enc_n_layers=3, ctc_weight=0.2, sub1_weight=0.2,
                 ctc_weight_sub1=0.2, enc_n_layers_sub1=2)
    model = build_speech2text(args)
    xs, xlens, ys, ylens = _batch()
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, obs = model.apply(v, xs, xlens, ys, ylens)
    assert "loss_ctc_sub1" in obs
    assert np.isfinite(float(loss))


def test_s2t_specaugment_training_path():
    args = _args(ctc_weight=1.0, freq_width=5, n_freq_masks=1,
                 time_width=10, n_time_masks=1)
    model = build_speech2text(args)
    xs, xlens, ys, ylens = _batch()
    v = model.init(RNG, xs, xlens, ys, ylens)
    loss, _ = model.apply(
        v, xs, xlens, ys, ylens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1),
              "specaug": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_overfit_blstm_ctc_ci_corpus(tmp_path):
    """The reference's ci_test in spirit: train a tiny BLSTM-CTC until it
    fits the synthetic corpus, then check greedy decode recovers training
    transcripts."""
    from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
    from neural_sp_tpu.datasets.asr.build import build_dataloader

    paths = make_ci_corpus(str(tmp_path), n_train=16, n_dev=4, n_test=4,
                           max_words=3, seed=3)
    loader = build_dataloader(paths["train"], paths["dict_char"], unit="char",
                              batch_size=16, bucketing="sort",
                              pad_xlen_multiple=512, pad_ylen_multiple=16)
    args = _args(input_dim=80, vocab=loader.vocab, ctc_weight=1.0,
                 enc_n_units=32, enc_n_layers=2, lsm_prob=0.0)
    model = build_speech2text(args)

    batch = next(iter(loader))
    xs = jnp.asarray(batch["xs"]); xlens = jnp.asarray(batch["xlens"])
    ys = jnp.asarray(batch["ys"]); ylens = jnp.asarray(batch["ylens"])
    v = model.init(RNG, xs, xlens, ys, ylens)
    tx = build_optimizer("adam", lr=3e-3, clip_grad_norm=5.0)
    opt_state = tx.init(v["params"])

    @jax.jit
    def step(params, opt_state, xs, xlens, ys, ylens):
        def loss_fn(p):
            return model.apply({"params": p}, xs, xlens, ys, ylens)[0]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = v["params"]
    losses = []
    # 250 steps: convergence to exact decode happens ~step 200-250 (at 150
    # it sits on the 6-8/16 margin and tracks harmless numeric drift)
    for i in range(250):
        params, opt_state, loss = step(params, opt_state, xs, xlens, ys, ylens)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.25, (losses[0], losses[-1])

    # greedy decode the training batch
    eouts, _ = model.apply({"params": params}, xs, xlens,
                           method=model.encode)
    paths_best = model.apply(
        {"params": params}, eouts["ys"]["xs"],
        method=lambda mdl, e: mdl.ctc.best_path(e))
    hyps = ctc_greedy(np.asarray(paths_best), np.asarray(eouts["ys"]["xlens"]))
    refs = [list(map(int, filter(lambda t: t != 3, row)))
            for row in np.asarray(ys)]
    n_match = sum(h == r for h, r in zip(hyps, refs))
    assert n_match >= 14, list(zip(hyps, refs))
