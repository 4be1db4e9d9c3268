"""Gradient-accumulation equivalence: k accumulated microbatches must
update params identically (up to float tolerance) to one full-batch step.

The reference flagship recipe trains with batch_size 24000 frames +
accum_grad_n_steps 16 (reference
examples/librispeech/s5/conf/asr/transformer/conformer_..._large.yaml,
applied in trainers train.py via loss/accum backward); on TPU we keep the
effective batch fixed while raising the per-dispatch microbatch, so the
linearity of accumulation is load-bearing for the flagship bench.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavy lane (default CI deselects; run all with `-m ""`)
pytestmark = pytest.mark.slow


def _tiny_model():
    from types import SimpleNamespace
    from neural_sp_tpu.models.speech2text import build_speech2text
    args = SimpleNamespace(
        enc_type="conv_conformer", input_dim=16,
        conv_channels="4_4", conv_kernel_sizes="(3,3)_(3,3)",
        conv_poolings="(2,2)_(2,2)",
        enc_n_layers=2, transformer_d_model=16, transformer_d_ff=32,
        transformer_n_heads=2, transformer_enc_pe_type="relative",
        conformer_kernel_size=7,
        dec_type="lstm", dec_n_units=16, dec_n_layers=1, emb_dim=16,
        dec_bottleneck_dim=16, attn_type="location", attn_dim=16,
        attn_conv_width=9, vocab=11, ctc_weight=0.3, lsm_prob=0.1,
        dropout_enc=0.0, dropout_att=0.0, dropout_dec=0.0, dropout_emb=0.0)
    return build_speech2text(args), args


def _batch(bs, t=64, u=6, vocab=11, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.standard_normal((bs, t, 16)), jnp.float32)
    xlens = jnp.full((bs,), t, jnp.int32)
    ys = jnp.asarray(rng.integers(4, vocab, (bs, u)), jnp.int32)
    ylens = jnp.full((bs,), u, jnp.int32)
    return xs, xlens, ys, ylens


def test_accum_matches_full_batch():
    from neural_sp_tpu.trainers.optimizer import build_optimizer
    model, args = _tiny_model()
    k, mb = 4, 2
    xs, xlens, ys, ylens = _batch(k * mb)
    v = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)
    p0 = v["params"]

    def loss_fn(p, sl):
        return model.apply({"params": p}, xs[sl], xlens[sl], ys[sl],
                           ylens[sl])[0]

    # SGD, not adam: adam's first-step update is lr*g/(|g|+eps) — a sign
    # function, infinitely sensitive to float-level grad differences — so
    # only a LINEAR optimizer gives a well-conditioned equivalence check
    # of the accumulation itself (no clip for the same reason)
    tx_full = build_optimizer("sgd", lr=1e-2, clip_grad_norm=0)
    tx_acc = build_optimizer("sgd", lr=1e-2, clip_grad_norm=0,
                             accum_grad_n_steps=k)
    import optax

    # full batch: one step
    g_full = jax.grad(loss_fn)(p0, slice(None))
    o = tx_full.init(p0)
    up, _ = tx_full.update(g_full, o, p0)
    p_full = optax.apply_updates(p0, up)

    # accumulated: k microbatch steps; only the k-th applies
    p_acc, o_acc = p0, tx_acc.init(p0)
    for i in range(k):
        g = jax.grad(loss_fn)(p_acc, slice(i * mb, (i + 1) * mb))
        up, o_acc = tx_acc.update(g, o_acc, p_acc)
        p_acc = optax.apply_updates(p_acc, up)
        if i < k - 1:
            # mini-steps are identity updates until the k-th
            chex_same = jax.tree.map(
                lambda a, b: np.allclose(a, b), p_acc, p0)
            assert all(jax.tree.leaves(chex_same))

    # microbatch grads average to the full-batch grad (same per-utt loss
    # weighting) -> identical sgd update up to float reassociation
    err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p_full, p_acc)
    assert max(jax.tree.leaves(err)) < 2e-5, err
