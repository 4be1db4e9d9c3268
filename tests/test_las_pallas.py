"""Fused Pallas LAS decoder scan vs the XLA scan path (interpret mode).

The kernel (ops/las_scan_pallas.py) specializes the flagship decoder
step — 1-layer LSTM + location attention with hoisted readout/embedding
(reference semantics las.py:667-789) — so its teacher-forced loss AND
gradients must match the stock scan to float tolerance.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_sp_tpu import PAD

RNG = jax.random.PRNGKey(0)


def _build(attn_kernel=9, t=9, bs=4):
    from neural_sp_tpu.models.decoders.las import RNNDecoder
    dec = RNNDecoder(vocab=11, enc_n_units=12, n_units=16, n_projs=0,
                     n_layers=1, emb_dim=8, bottleneck_dim=12,
                     attn_type="location", attn_dim=10,
                     attn_conv_n_channels=4,
                     attn_conv_kernel_size=attn_kernel,
                     lsm_prob=0.1)
    k1, _ = jax.random.split(jax.random.PRNGKey(1))
    eouts = jax.random.normal(k1, (bs, t, 12))
    elens = jnp.asarray([t, t - 3, t - 1, t - 4][:bs])
    ys = jnp.asarray(np.array([[4, 5, 6, 7], [8, 9, PAD, PAD],
                               [5, 5, 5, PAD], [10, 4, PAD, PAD]][:bs],
                              np.int32))
    ylens = jnp.asarray([4, 2, 3, 2][:bs])
    params = dec.init(RNG, eouts, elens, ys, ylens)["params"]
    return dec, params, (eouts, elens, ys, ylens)


@pytest.mark.parametrize("attn_kernel,t", [(9, 9), (21, 33)])
def test_pallas_scan_matches_xla(attn_kernel, t):
    dec, params, batch = _build(attn_kernel, t)

    def loss_fn(p):
        loss, obs = dec.apply({"params": p}, *batch, True)
        return loss, obs

    assert "NSP_DEC_PALLAS" not in os.environ
    (l_x, obs_x), g_x = jax.value_and_grad(loss_fn, has_aux=True)(params)
    os.environ["NSP_DEC_PALLAS"] = "interpret"
    try:
        (l_p, obs_p), g_p = jax.value_and_grad(loss_fn, has_aux=True)(params)
    finally:
        del os.environ["NSP_DEC_PALLAS"]

    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(obs_p["acc_att"]),
                               float(obs_x["acc_att"]), atol=1e-6)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(g_x))
    n = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_p):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_x[path]), rtol=5e-4,
            atol=5e-5, err_msg=jax.tree_util.keystr(path))
        n += 1
    assert n == len(flat_x)
    # every weight the kernel touches must receive gradient
    for key, sub in (("embed", "embedding"), ("cells_0", None),
                     ("attn", None), ("w_gen", "kernel"),
                     ("output", "kernel")):
        g = g_p["step"][key]
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert total > 0, key
    conv_g = g_p["step"]["attn"]["conv"]["kernel"]
    assert float(jnp.abs(conv_g).sum()) > 0


def test_pallas_scan_stochastic_smoke():
    from neural_sp_tpu.models.decoders.las import RNNDecoder
    dec, params, batch = _build()
    dec2 = dec.clone(dropout=0.3, dropout_emb=0.2)
    os.environ["NSP_DEC_PALLAS"] = "interpret"
    try:
        def loss_fn(p):
            loss, _ = dec2.apply({"params": p}, *batch, False,
                                 rngs={"dropout": jax.random.PRNGKey(3)})
            return loss
        loss, g = jax.value_and_grad(loss_fn)(params)
    finally:
        del os.environ["NSP_DEC_PALLAS"]
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_pallas_ineligible_configs_fall_back():
    """2-layer / mocha / scheduled-sampling configs must not take the
    kernel path (pallas_eligible False) — the flag can stay on globally."""
    from neural_sp_tpu.models.decoders.las import LASStep
    step = LASStep(vocab=11, enc_n_units=12, n_units=16, n_projs=0,
                   n_layers=2, emb_dim=8, bottleneck_dim=12,
                   attn_type="location", attn_dim=10)
    os.environ["NSP_DEC_PALLAS"] = "1"
    try:
        assert not step.pallas_eligible(True)          # 2 layers
        step1 = step.clone(n_layers=1, attn_type="mocha")
        assert not step1.pallas_eligible(True)         # mocha
        step2 = step.clone(n_layers=1, ss_prob=0.5)
        assert not step2.pallas_eligible(False)        # scheduled sampling
        step3 = step.clone(n_layers=1)
        assert step3.pallas_eligible(True)
    finally:
        del os.environ["NSP_DEC_PALLAS"]
