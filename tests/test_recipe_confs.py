"""Recipe conf validation.

1. EVERY yaml under examples/ parses through the arg loader with exponent
   literals coerced to floats (lr: 1e-3 etc.).
2. Every ci_test ASR conf (the reference's CI matrix,
   examples/ci_test/conf/asr/) builds a model and runs one train-style
   forward+grad on tiny data — so the transcribed conf vocabulary is
   actually consumable end-to-end, not just parseable.
3. Every ci_test LM conf builds + forwards.
"""
import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neural_sp_tpu.bin.args import load_config, parse_cli

# heavy lane (default CI deselects; run all with `-m ""`)
pytestmark = pytest.mark.slow

ROOT = os.path.join(os.path.dirname(__file__), "..", "examples")
ALL_YAMLS = sorted(glob.glob(f"{ROOT}/**/*.yaml", recursive=True))
CI_ASR = sorted(glob.glob(f"{ROOT}/ci_test/conf/asr/*.yaml"))
CI_LM = sorted(glob.glob(f"{ROOT}/ci_test/conf/lm/*.yaml"))


def test_all_confs_parse():
    assert len(ALL_YAMLS) > 150
    for p in ALL_YAMLS:
        conf = load_config(p)
        assert isinstance(conf, dict) and conf, p
        for k in ("lr", "weight_decay", "warmup_start_lr", "mocha_eps"):
            if k in conf:
                assert isinstance(conf[k], (int, float)), (p, k, conf[k])


@pytest.mark.parametrize("conf_path", CI_ASR,
                         ids=[os.path.basename(p) for p in CI_ASR])
def test_ci_asr_conf_builds_and_trains(conf_path):
    from neural_sp_tpu.models.speech2text import build_speech2text
    args = parse_cli(["--config", conf_path])
    args.input_dim = 16
    args.vocab = 12
    if getattr(args, "sub1_weight", 0):
        args.vocab_sub1 = 10
    if getattr(args, "sub2_weight", 0):
        args.vocab_sub2 = 10
    model = build_speech2text(args)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((2, 45, 16)), jnp.float32)
    xlens = jnp.asarray([45, 31], jnp.int32)
    ys = jnp.asarray([[4, 5, 6, 3], [7, 8, 3, 3]], jnp.int32)
    ylens = jnp.asarray([3, 2], jnp.int32)
    batch = dict(ys=ys, ylens=ylens)
    if getattr(args, "sub1_weight", 0):
        batch["ys_sub1"] = ys
        batch["ylens_sub1"] = ylens
    v = model.init(jax.random.PRNGKey(0), xs, xlens, ys, ylens)

    def loss_fn(p):
        loss, obs = model.apply(p, xs, xlens, ys, ylens,
                                deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(1),
                                      "specaug": jax.random.PRNGKey(2)})
        return loss
    loss, g = jax.value_and_grad(loss_fn)(v)
    assert np.isfinite(float(loss)), conf_path
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


@pytest.mark.parametrize("conf_path", CI_LM,
                         ids=[os.path.basename(p) for p in CI_LM])
def test_ci_lm_conf_builds(conf_path):
    from neural_sp_tpu.models.lm.build import build_lm
    args = parse_cli(["--config", conf_path])
    args.vocab = 30
    lm = build_lm(args)
    ys = jnp.asarray(np.random.default_rng(0).integers(0, 30, (2, 12)),
                     jnp.int32)
    v = lm.init(jax.random.PRNGKey(0), ys[:, :-1], ys[:, 1:])
    out = lm.apply(v, ys[:, :-1], ys[:, 1:])
    loss = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(float(np.asarray(loss).mean())), conf_path
