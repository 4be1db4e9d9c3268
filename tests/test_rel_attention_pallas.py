"""Fused Pallas rel-attention kernel == the materialized XLA path.

Runs the kernel in interpret mode (NSP_PALLAS_ATTN=interpret) on CPU and
checks forward outputs and input grads against the module's default
clamped rel-PE path (reference semantics:
neural_sp/models/modules/relative_multihead_attention.py:112-144).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_sp_tpu.models.modules.relative_multihead_attention import (
    RelativeMultiheadAttention)
from neural_sp_tpu.ops.rel_attention_pallas import rel_attention


def _run(module, variables, xs, klens, env):
    old = os.environ.get("NSP_PALLAS_ATTN")
    os.environ["NSP_PALLAS_ATTN"] = env
    try:
        out, _, _ = module.apply(variables, xs, klens=klens)
        return out
    finally:
        if old is None:
            del os.environ["NSP_PALLAS_ATTN"]
        else:
            os.environ["NSP_PALLAS_ATTN"] = old


@pytest.mark.parametrize("klens", [[37, 37], [37, 21]])
def test_module_pallas_matches_default(klens):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 37, 32)), jnp.float32)
    klens = jnp.asarray(klens, jnp.int32)
    mha = RelativeMultiheadAttention(d_model=32, n_heads=4, clamp_len=5,
                                     xl_like=False)
    v = mha.init(jax.random.PRNGKey(0), xs, klens=None)
    # default path has no key-padding mask arg here; apply it via mask
    t = xs.shape[1]
    mask = (jnp.arange(t)[None, :] < klens[:, None])[:, None, :]
    ref, _, _ = mha.apply(v, xs, mask=mask)
    got = _run(mha, v, xs, klens, "interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_module_pallas_grads_match():
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((2, 29, 32)), jnp.float32)
    klens = jnp.asarray([29, 17], jnp.int32)
    t = xs.shape[1]
    mask = (jnp.arange(t)[None, :] < klens[:, None])[:, None, :]
    mha = RelativeMultiheadAttention(d_model=32, n_heads=4, clamp_len=5,
                                     xl_like=False)
    v = mha.init(jax.random.PRNGKey(0), xs, klens=None)

    def loss_ref(p):
        out, _, _ = mha.apply({"params": p}, xs, mask=mask)
        return jnp.sum(out ** 2)

    def loss_pl(p):
        out, _, _ = mha.apply({"params": p}, xs, klens=klens)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(v["params"])
    old = os.environ.get("NSP_PALLAS_ATTN")
    os.environ["NSP_PALLAS_ATTN"] = "interpret"
    try:
        g_pl = jax.grad(loss_pl)(v["params"])
    finally:
        if old is None:
            del os.environ["NSP_PALLAS_ATTN"]
        else:
            os.environ["NSP_PALLAS_ATTN"] = old
    ref_flat = {jax.tree_util.keystr(k): x for k, x in
                jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, x in jax.tree_util.tree_leaves_with_path(g_pl):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(ref_flat[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-4, err_msg=jax.tree_util.keystr(k))


def test_kernel_direct_vs_numpy():
    """The raw kernel vs a numpy reference of its documented semantics."""
    rng = np.random.default_rng(2)
    b, h, t, dk, r = 2, 3, 40, 8, 6
    q = rng.standard_normal((b, h, t, dk)).astype(np.float32)
    k = rng.standard_normal((b, h, t, dk)).astype(np.float32)
    v = rng.standard_normal((b, h, t, dk)).astype(np.float32)
    p = rng.standard_normal((b, h, t, r)).astype(np.float32)
    klens = np.asarray([40, 23], np.int32)

    qi = np.arange(t)[:, None]
    kj = np.arange(t)[None, :]
    idx = np.minimum(np.abs(qi - kj), r - 1)
    s = np.einsum("bhid,bhjd->bhij", q, k)
    bias = np.zeros((b, h, t, t), np.float32)
    for bb in range(b):
        for hh in range(h):
            bias[bb, hh] = p[bb, hh][np.arange(t)[:, None], idx]
    s = s + bias
    for bb in range(b):
        s[bb, :, :, klens[bb]:] = -1e30
    m = s.max(-1, keepdims=True)
    e = np.exp(s - m)
    aws = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhij,bhjd->bhid", aws, v)

    old = os.environ.get("NSP_PALLAS_ATTN")
    os.environ["NSP_PALLAS_ATTN"] = "interpret"
    try:
        got = rel_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(p), jnp.asarray(klens))
    finally:
        if old is None:
            del os.environ["NSP_PALLAS_ATTN"]
        else:
            os.environ["NSP_PALLAS_ATTN"] = old
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
