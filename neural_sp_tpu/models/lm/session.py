"""LMSession: jitted one-step prediction + sequence scoring + cache model.

Serves shallow fusion, second-pass n-best rescoring (reference
``beam_search.py:115-140``), and the unigram cache model interpolation
(reference ``lm_base.py:72-112``): p = (1-lam)*p_lm + lam*p_cache, where
p_cache is a softmax over attention of the current hidden state to the last
``cache_size`` hidden states, mass placed on their next tokens.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ... import EOS
from .rnnlm import RNNLM
from .transformerlm import TransformerLM
from .transformer_xl import TransformerXL
from .gated_convlm import GatedConvLM


class LMSession:
    def __init__(self, lm, params, cache_size: int = 0,
                 cache_lambda: float = 0.2, cache_theta: float = 0.3):
        self.lm = lm
        self.params = params
        self.cache_size = cache_size
        self.cache_lambda = cache_lambda
        self.cache_theta = cache_theta
        self._predict = jax.jit(lambda y, st: lm.apply(
            {"params": params}, y, st, method=lm.predict))

    def initial_state(self, bs: int):
        if isinstance(self.lm, TransformerLM):
            return self.lm.init_cache(bs)
        if isinstance(self.lm, TransformerXL):
            return self.lm.init_mems(bs)
        if isinstance(self.lm, GatedConvLM):
            return self.lm.init_cache(bs)
        return None  # RNNLM: None = zero state

    def predict(self, y: np.ndarray, state):
        """y: [B] int32 -> (log_probs [B, V] np, new_state)."""
        lp, new_state, _ = self._predict(jnp.asarray(y, jnp.int32), state)
        return np.asarray(lp), new_state

    def predict_with_hidden(self, y, state):
        lp, new_state, h = self._predict(jnp.asarray(y, jnp.int32), state)
        return np.asarray(lp), new_state, np.asarray(h)

    def score_sequence(self, ids: list[int], sos: int = EOS) -> float:
        """Sum log p(ids) with sos prepended (for n-best rescoring)."""
        state = self.initial_state(1)
        seq = [sos] + list(ids)
        total = 0.0
        for t in range(len(seq) - 1):
            lp, state = self.predict(np.asarray([seq[t]], np.int32), state)
            total += float(lp[0, seq[t + 1]])
        return total

    def ppl_with_cache(self, ids: list[int], sos: int = EOS) -> float:
        """Per-token PPL with the unigram cache model interpolation."""
        state = self.initial_state(1)
        seq = [sos] + list(ids)
        hist_h: list[np.ndarray] = []
        hist_y: list[int] = []
        total = 0.0
        for t in range(len(seq) - 1):
            lp, state, h = self.predict_with_hidden(
                np.asarray([seq[t]], np.int32), state)
            probs = np.exp(lp[0])
            if self.cache_size > 0 and hist_h:
                hs = np.stack(hist_h[-self.cache_size:])  # [M, D]
                ys = hist_y[-self.cache_size:]
                att = np.exp(self.cache_theta * (hs @ h[0]))
                att /= att.sum()
                p_cache = np.zeros_like(probs)
                for w, yid in zip(att, ys):
                    p_cache[yid] += w
                probs = (1 - self.cache_lambda) * probs + \
                    self.cache_lambda * p_cache
            total += np.log(max(probs[seq[t + 1]], 1e-12))
            hist_h.append(h[0])
            hist_y.append(seq[t + 1])
        n = max(len(seq) - 1, 1)
        return float(np.exp(-total / n))


def rescore_nbest(nbest: list[list[int]], scores: list[float],
                  lm_session: LMSession, lm_weight: float,
                  lm_session_bwd: LMSession | None = None,
                  lm_weight_bwd: float = 0.0) -> list[int]:
    """Second-pass (and backward) LM rescoring (reference
    beam_search.py:115-140); returns the best hypothesis."""
    best, best_score = nbest[0] if nbest else [], -np.inf
    for hyp, sc in zip(nbest, scores):
        total = sc + lm_weight * lm_session.score_sequence(hyp)
        if lm_session_bwd is not None and lm_weight_bwd > 0:
            total += lm_weight_bwd * lm_session_bwd.score_sequence(
                list(reversed(hyp)))
        if total > best_score:
            best, best_score = hyp, total
    return best
