"""Loss criteria (pure JAX, f32 accumulation).

TPU-native equivalents of reference ``neural_sp/models/criterion.py``:
  - cross_entropy_lsm   <- criterion.py:45-87
  - distillation        <- criterion.py:89-107
  - kldiv_lsm_ctc       <- criterion.py:110-127
  - focal_loss          <- criterion.py:130-149
MBR (criterion.py:15-42) lives in decoders/las.py next to its beam search.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_lsm(
    logits: jnp.ndarray,
    ys: jnp.ndarray,
    lsm_prob: float = 0.0,
    ignore_index: int = -1,
    normalize_length: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cross entropy with uniform label smoothing.

    logits: [B, T, V] (f32 or bf16; promoted to f32), ys: [B, T] int ids.
    Returns (scalar loss, scalar ppl-proxy mean nll over valid tokens).
    Normalisation: by #valid tokens if ``normalize_length`` else by batch size
    (reference semantics, criterion.py:82-86).
    """
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    mask = (ys != ignore_index)
    ys_safe = jnp.where(mask, ys, 0)
    nll = -jnp.take_along_axis(log_probs, ys_safe[..., None], axis=-1)[..., 0]
    if lsm_prob > 0.0:
        # reference target_dist: (1-lsm) on the target, lsm/(V-1) on each of
        # the OTHER classes (criterion.py:72-76 — scatter overwrites the
        # target slot, so the target does NOT receive the uniform share)
        sum_neg_lp = -jnp.sum(log_probs, axis=-1)
        per_tok = (1.0 - lsm_prob) * nll + \
            lsm_prob / (v - 1) * (sum_neg_lp - nll)
    else:
        per_tok = nll
    per_tok = jnp.where(mask, per_tok, 0.0)
    n_tok = jnp.maximum(jnp.sum(mask), 1)
    denom = n_tok if normalize_length else logits.shape[0]
    loss = jnp.sum(per_tok) / denom
    mean_nll = jnp.sum(jnp.where(mask, nll, 0.0)) / n_tok
    return loss, mean_nll


def compute_accuracy(logits: jnp.ndarray, ys: jnp.ndarray, ignore_index: int = -1) -> jnp.ndarray:
    """Teacher-forcing token accuracy (%), reference torch_utils.py:117-133."""
    pred = jnp.argmax(logits, axis=-1)
    mask = (ys != ignore_index)
    correct = jnp.sum((pred == ys) & mask)
    return 100.0 * correct / jnp.maximum(jnp.sum(mask), 1)


def distillation(
    student_logits: jnp.ndarray,
    teacher_probs: jnp.ndarray,
    ys: jnp.ndarray,
    ignore_index: int = -1,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Soft-target KL distillation loss (criterion.py:89-107).

    teacher_probs: [B, T, V] probabilities (already softmaxed by the teacher).
    """
    log_probs = jax.nn.log_softmax(
        student_logits.astype(jnp.float32) / temperature, axis=-1)
    mask = (ys != ignore_index)
    per_tok = -jnp.sum(teacher_probs * log_probs, axis=-1)
    per_tok = jnp.where(mask, per_tok, 0.0)
    return jnp.sum(per_tok) / student_logits.shape[0]


def kldiv_lsm_ctc(logits: jnp.ndarray, elens: jnp.ndarray) -> jnp.ndarray:
    """KL( softmax(logits) || uniform ) over valid frames, for CTC label
    smoothing (criterion.py:110-127). logits: [B, T, V]."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    kl = jnp.sum(probs * (log_probs - (-jnp.log(v))), axis=-1)  # [B, T]
    from .masks import make_pad_mask
    mask = make_pad_mask(elens, logits.shape[1])
    kl = jnp.where(mask, kl, 0.0)
    return jnp.sum(kl) / logits.shape[0]


def focal_loss(
    logits: jnp.ndarray,
    ys: jnp.ndarray,
    gamma: float = 2.0,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Focal loss (criterion.py:130-149)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = (ys != ignore_index)
    ys_safe = jnp.where(mask, ys, 0)
    logp = jnp.take_along_axis(log_probs, ys_safe[..., None], axis=-1)[..., 0]
    p = jnp.exp(logp)
    per_tok = -((1.0 - p) ** gamma) * logp
    per_tok = jnp.where(mask, per_tok, 0.0)
    return jnp.sum(per_tok) / logits.shape[0]
