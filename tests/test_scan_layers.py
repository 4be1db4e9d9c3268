"""Scan-over-layers encoder fast path == unrolled path, same params."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_sp_tpu.models.encoders.transformer import XformerEncoder

# heavy end-to-end lane (default CI deselects via pytest.ini addopts; run all with `-m ""`)
pytestmark = pytest.mark.slow


def _mk(btype, scan_layers, **kw):
    base = dict(input_dim=20, btype=btype, d_model=32, d_ff=64, n_heads=4,
                n_layers=4, pe_type="relative", clamp_len=5,
                conv_kernel_size=7, scan_layers=scan_layers)
    base.update(kw)
    return XformerEncoder(**base)


@pytest.mark.parametrize("btype", ["transformer", "conformer"])
@pytest.mark.parametrize("subsample", [(), (1, 2, 1, 1)])
def test_scan_matches_unrolled(btype, subsample):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 37, 20)), jnp.float32)
    xlens = jnp.asarray([37, 29], jnp.int32)
    enc_u = _mk(btype, False, subsample=subsample)
    enc_s = _mk(btype, True, subsample=subsample)
    v = enc_u.init(jax.random.PRNGKey(0), xs, xlens)
    out_u = enc_u.apply(v, xs, xlens)
    out_s = enc_s.apply(v, xs, xlens)
    a, b = out_u["ys"]["xs"], out_s["ys"]["xs"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out_u["ys"]["xlens"]),
                                  np.asarray(out_s["ys"]["xlens"]))


def test_scan_with_sub_tap():
    """A sub1 tap mid-stack splits the scan run at the tap layer."""
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((2, 23, 20)), jnp.float32)
    xlens = jnp.asarray([23, 17], jnp.int32)
    enc_u = _mk("conformer", False, n_layers_sub1=2)
    enc_s = _mk("conformer", True, n_layers_sub1=2)
    v = enc_u.init(jax.random.PRNGKey(0), xs, xlens)
    out_u = enc_u.apply(v, xs, xlens)
    out_s = enc_s.apply(v, xs, xlens)
    for k in ("ys", "ys_sub1"):
        np.testing.assert_allclose(np.asarray(out_u[k]["xs"]),
                                   np.asarray(out_s[k]["xs"]),
                                   rtol=2e-5, atol=2e-5)


def test_scan_training_mode_runs():
    """Dropout path (per-layer rngs inside the scan) runs and is finite."""
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((2, 19, 20)), jnp.float32)
    xlens = jnp.asarray([19, 19], jnp.int32)
    enc = _mk("conformer", True, dropout=0.1)
    v = enc.init(jax.random.PRNGKey(0), xs, xlens)
    out = enc.apply(v, xs, xlens, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out["ys"]["xs"])).all()


def test_scan_grads_match():
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.standard_normal((2, 21, 20)), jnp.float32)
    xlens = jnp.asarray([21, 21], jnp.int32)
    enc_u = _mk("conformer", False)
    enc_s = _mk("conformer", True)
    v = enc_u.init(jax.random.PRNGKey(0), xs, xlens)

    def loss(p, enc):
        out = enc.apply({"params": p}, xs, xlens)
        return jnp.sum(out["ys"]["xs"] ** 2)

    gu = jax.grad(loss)(v["params"], enc_u)
    gs = jax.grad(loss)(v["params"], enc_s)
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    gs_map = dict(jax.tree_util.tree_leaves_with_path(gs))
    gs_map = {jax.tree_util.keystr(k): x
              for k, x in jax.tree_util.tree_leaves_with_path(gs)}
    for path, x in flat_u:
        y = gs_map[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(path))
