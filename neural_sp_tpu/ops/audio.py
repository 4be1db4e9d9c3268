"""On-device audio feature extraction: log-mel filterbank + CMVN.

TPU-native replacement for the reference's Kaldi featbin pipeline
(``make_fbank.sh`` / ``compute-cmvn-stats`` / ``apply-cmvn`` — wired at
``examples/librispeech/s5/run.sh:126-182`` and ``utils/dump_feat.sh``).

Feature parameters default to Kaldi's fbank defaults (25 ms / 10 ms frames,
povey window, preemphasis 0.97, snip-edges) so TSV pipelines built on either
frontend are interchangeable. The framing + FFT + mel projection are pure
jnp ops; the mel matrix is a static host-side constant so the projection runs
on the MXU.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _mel_scale(hz: np.ndarray) -> np.ndarray:
    return 1127.0 * np.log(1.0 + hz / 700.0)


def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = 512,
    sample_rate: int = 16000,
    low_freq: float = 20.0,
    high_freq: float | None = None,
) -> np.ndarray:
    """[n_fft//2+1, n_mels] triangular mel filterbank (Kaldi-style, HTK mel)."""
    if high_freq is None:
        high_freq = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.arange(n_bins) * sample_rate / n_fft
    mel_lo, mel_hi = _mel_scale(np.asarray(low_freq)), _mel_scale(np.asarray(high_freq))
    centers = np.linspace(mel_lo, mel_hi, n_mels + 2)
    mel_f = _mel_scale(fft_freqs)
    fb = np.zeros((n_bins, n_mels), np.float32)
    for m in range(n_mels):
        left, center, right = centers[m], centers[m + 1], centers[m + 2]
        up = (mel_f - left) / max(center - left, 1e-6)
        down = (right - mel_f) / max(right - center, 1e-6)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def povey_window(n: int) -> np.ndarray:
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    return (hann ** 0.85).astype(np.float32)


@partial(jax.jit, static_argnames=(
    "sample_rate", "n_mels", "frame_length_ms", "frame_shift_ms", "n_fft",
    "preemphasis", "remove_dc"))
def logmel_fbank(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    n_mels: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    n_fft: int = 512,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
) -> jnp.ndarray:
    """waveform [N] (float, any scale) -> log-mel features [T, n_mels]."""
    win = int(sample_rate * frame_length_ms / 1000)
    hop = int(sample_rate * frame_shift_ms / 1000)
    n = waveform.shape[0]
    n_frames = max(1 + (n - win) // hop, 1)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :])
    frames = waveform[jnp.clip(idx, 0, n - 1)].astype(jnp.float32)
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemphasis > 0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(povey_window(win))
    frames = jnp.pad(frames, ((0, 0), (0, n_fft - win)))
    spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=1)) ** 2  # power
    mel = spec @ jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    return jnp.log(jnp.maximum(mel, 1e-10))


def compute_cmvn_stats(feats_list) -> tuple[np.ndarray, np.ndarray]:
    """Global mean/std over a list of [T, D] numpy feature arrays."""
    total = np.zeros(feats_list[0].shape[1], np.float64)
    total_sq = np.zeros_like(total)
    n = 0
    for f in feats_list:
        total += f.sum(0)
        total_sq += (f.astype(np.float64) ** 2).sum(0)
        n += f.shape[0]
    mean = total / max(n, 1)
    var = total_sq / max(n, 1) - mean ** 2
    return mean.astype(np.float32), np.sqrt(np.maximum(var, 1e-8)).astype(np.float32)


def apply_cmvn(feats: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    return (feats - mean) / std
