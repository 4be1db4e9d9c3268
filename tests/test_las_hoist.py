"""Hoisted-scan equivalence for the LAS decoder.

The decode scan hoists (a) the readout/vocab matmuls and (b) the embedding
half of the layer-0 LSTM gate pre-activations out of the per-step loop
(las.py ``hoists_readout`` / ``hoist_emb_gates``).  Both hoists are pure
re-associations of the same math, so the teacher-forced loss AND its
gradients must match the naive per-step path (``NSP_NO_HOIST=1``) to float
tolerance.  Reference behaviour: per-step loop las.py:667-704.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_sp_tpu import PAD

# heavy lane (default CI deselects; run all with `-m ""`)
pytestmark = pytest.mark.slow

RNG = jax.random.PRNGKey(0)


def _build():
    from neural_sp_tpu.models.decoders.las import RNNDecoder
    dec = RNNDecoder(vocab=11, enc_n_units=12, n_units=16, n_projs=0,
                     n_layers=2, emb_dim=8, bottleneck_dim=12,
                     attn_type="location", attn_dim=10,
                     attn_conv_n_channels=4, attn_conv_kernel_size=5,
                     lsm_prob=0.1)
    bs, t = 3, 9
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    eouts = jax.random.normal(k1, (bs, t, 12))
    elens = jnp.asarray([t, t - 3, t - 1])
    ys = jnp.asarray(np.array([[4, 5, 6, 7], [8, 9, PAD, PAD],
                               [5, 5, 5, PAD]], np.int32))
    ylens = jnp.asarray([4, 2, 3])
    params = dec.init(RNG, eouts, elens, ys, ylens)["params"]
    return dec, params, (eouts, elens, ys, ylens)


@pytest.mark.parametrize("deterministic", [True, False])
def test_hoisted_loss_and_grads_match_stepwise(deterministic):
    dec, params, batch = _build()

    def loss_fn(p):
        loss, obs = dec.apply({"params": p}, *batch, deterministic,
                              rngs={"dropout": jax.random.PRNGKey(7)})
        return loss, obs

    assert "NSP_NO_HOIST" not in os.environ
    (l_h, obs_h), g_h = jax.value_and_grad(loss_fn, has_aux=True)(params)
    os.environ["NSP_NO_HOIST"] = "1"
    try:
        (l_s, obs_s), g_s = jax.value_and_grad(loss_fn, has_aux=True)(params)
    finally:
        del os.environ["NSP_NO_HOIST"]

    np.testing.assert_allclose(float(l_h), float(l_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(obs_h["acc_att"]),
                               float(obs_s["acc_att"]), atol=1e-6)
    flat_h = jax.tree_util.tree_leaves_with_path(g_h)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(g_s))
    n_checked = 0
    for path, leaf in flat_h:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), rtol=2e-4,
            atol=2e-5, err_msg=jax.tree_util.keystr(path))
        n_checked += 1
    assert n_checked == len(flat_s)
    # the hoist must not silently detach layer-0 / embedding grads
    emb_g = g_h["step"]["embed"]["embedding"]
    cell0_g = g_h["step"]["cells_0"]["ii"]["kernel"]
    assert float(jnp.abs(emb_g).sum()) > 0
    assert float(jnp.abs(cell0_g).sum()) > 0
