"""CTC decoder head: loss, posteriors, greedy + prefix beam search, and the
joint-decoding prefix scorer.

Reference: ``neural_sp/models/seq2seq/decoders/ctc.py:35-871``.
  * loss_fn (:139-150)            -> ops.ctc.ctc_loss (Pallas-style scan)
  * label-smoothing mix (:128-129)-> ops.criterion.kldiv_lsm_ctc
  * greedy (:219-243)             -> device argmax + host collapse
  * _beam_search (:358-483)       -> frame-synchronous prefix search with
                                     optional LM shallow fusion (host-side
                                     over device-computed posteriors)
  * CTCPrefixScore (:756-871)     -> vectorized numpy scorer with
                                     register_new_chunk for streaming
  * trigger-point extraction (:152-195) -> ops.ctc.ctc_forced_align
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ... import BLANK, EOS
from ...ops.ctc import ctc_loss, ctc_forced_align
from ...ops.criterion import kldiv_lsm_ctc
from ...ops.dropout import Dropout

LOG0 = -1.0e10


class CTC(nn.Module):
    vocab: int
    enc_n_units: int
    dropout: float = 0.0
    lsm_prob: float = 0.0
    fc_list: str = ""          # e.g. "512_512" intermediate Dense+ReLU stack

    @nn.compact
    def logits(self, eouts: jnp.ndarray, deterministic: bool = True):
        h = eouts
        if self.fc_list:
            for i, dim in enumerate(int(d) for d in self.fc_list.split("_")):
                h = nn.relu(nn.Dense(dim, name=f"fc{i}")(h))
                h = Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.vocab, name="output")(h)

    def __call__(self, eouts, elens, ys, ylens, deterministic: bool = True):
        """Returns (loss, logits [B, T, V])."""
        logits = self.logits(eouts, deterministic)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        loss = ctc_loss(log_probs, ys, elens, ylens, blank=BLANK)
        if self.lsm_prob > 0:
            loss = (1 - self.lsm_prob) * loss + \
                self.lsm_prob * kldiv_lsm_ctc(logits, elens) / \
                jnp.maximum(jnp.mean(ylens.astype(jnp.float32)), 1.0)
        return loss, logits

    def log_probs(self, eouts, deterministic: bool = True):
        return jax.nn.log_softmax(
            self.logits(eouts, deterministic).astype(jnp.float32), axis=-1)

    def best_path(self, eouts, deterministic: bool = True):
        return jnp.argmax(self.logits(eouts, deterministic), axis=-1)

    def trigger_points(self, eouts, elens, ys, ylens):
        lp = self.log_probs(eouts)
        trig, _ = ctc_forced_align(lp, ys, elens, ylens, blank=BLANK)
        return trig


def collapse_path(path, blank: int = BLANK) -> list[int]:
    """CTC collapse: merge repeats then drop blanks (host-side)."""
    out, prev = [], -1
    for p in path:
        p = int(p)
        if p != prev and p != blank:
            out.append(p)
        prev = p
    return out


def ctc_greedy(best_paths: np.ndarray, elens: np.ndarray) -> list[list[int]]:
    return [collapse_path(best_paths[b, : int(elens[b])])
            for b in range(best_paths.shape[0])]


def _logsumexp(*xs):
    m = max(xs)
    if m <= LOG0:
        return LOG0
    return m + np.log(sum(np.exp(x - m) for x in xs))


def ctc_prefix_beam_search(
    log_probs: np.ndarray,
    elen: int,
    beam_width: int = 10,
    blank: int = BLANK,
    lm_fn=None,
    lm_weight: float = 0.0,
    length_norm: bool = False,
) -> list[dict]:
    """Frame-synchronous CTC prefix beam search for one utterance
    (reference _beam_search ctc.py:358-483).

    log_probs: [T, V] numpy. lm_fn(prefix_tuple) -> [V] log probs (cached by
    the caller); LM score added on label expansion (shallow fusion).
    Returns n-best [{hyp, score, score_ctc, score_lm}] sorted best-first.
    """
    # beam entries: prefix tuple -> (p_blank, p_nonblank, lm_score)
    beam = {(): (0.0, LOG0, 0.0)}
    for t in range(elen):
        lp = log_probs[t]
        topk = np.argsort(lp)[::-1][: max(beam_width * 2, 8)]
        new_beam: dict = {}

        def add(prefix, pb, pnb, plm):
            if prefix in new_beam:
                opb, opnb, _ = new_beam[prefix]
                new_beam[prefix] = (_logsumexp(opb, pb),
                                    _logsumexp(opnb, pnb), plm)
            else:
                new_beam[prefix] = (pb, pnb, plm)

        for prefix, (pb, pnb, plm) in beam.items():
            p_total = _logsumexp(pb, pnb)
            # stay (blank or repeat last)
            add(prefix, p_total + lp[blank], LOG0 if not prefix else
                pnb + lp[prefix[-1]], plm)
            lm_row = None
            for k in topk:
                k = int(k)
                if k == blank:
                    continue
                if prefix and k == prefix[-1]:
                    # emit repeat only from blank-ending paths
                    p_new = pb + lp[k]
                else:
                    p_new = p_total + lp[k]
                plm_new = plm
                if lm_fn is not None and lm_weight > 0:
                    if lm_row is None:
                        lm_row = lm_fn(prefix)
                    plm_new = plm + float(lm_row[k])
                add(prefix + (k,), LOG0, p_new, plm_new)

        # prune
        scored = sorted(
            new_beam.items(),
            key=lambda kv: -(_logsumexp(kv[1][0], kv[1][1])
                             + lm_weight * kv[1][2]))
        beam = dict(scored[:beam_width])

    results = []
    for prefix, (pb, pnb, plm) in beam.items():
        sc_ctc = _logsumexp(pb, pnb)
        score = sc_ctc + lm_weight * plm
        if length_norm and len(prefix) > 0:
            score /= len(prefix)
        results.append({"hyp": list(prefix), "score": score,
                        "score_ctc": sc_ctc, "score_lm": plm})
    return sorted(results, key=lambda d: -d["score"])


class CTCBlockSyncBeam:
    """Block-synchronous (resumable) CTC prefix beam search
    (reference ``beam_search_block_sync`` ctc.py:485-531).

    Feed posterior blocks as they arrive with ``step``; ``hypotheses`` gives
    the current n-best; ``commit_and_reset`` finalises the running best
    (CTC-VAD segment boundary) and restarts the beam for the next segment.
    """

    def __init__(self, beam_width: int = 10, blank: int = BLANK,
                 lm_fn=None, lm_weight: float = 0.0):
        self.beam_width = beam_width
        self.blank = blank
        self.lm_fn = lm_fn
        self.lm_weight = lm_weight
        self.committed: list[int] = []
        self._reset_beam()

    def _reset_beam(self):
        self.beam = {(): (0.0, LOG0, 0.0)}

    def step(self, log_probs_block: np.ndarray, n_frames: int | None = None):
        lp_all = np.asarray(log_probs_block)
        t_max = n_frames if n_frames is not None else lp_all.shape[0]
        for t in range(t_max):
            lp = lp_all[t]
            topk = np.argsort(lp)[::-1][: max(self.beam_width * 2, 8)]
            new_beam: dict = {}

            def add(prefix, pb, pnb, plm):
                if prefix in new_beam:
                    opb, opnb, _ = new_beam[prefix]
                    new_beam[prefix] = (_logsumexp(opb, pb),
                                        _logsumexp(opnb, pnb), plm)
                else:
                    new_beam[prefix] = (pb, pnb, plm)

            for prefix, (pb, pnb, plm) in self.beam.items():
                p_total = _logsumexp(pb, pnb)
                add(prefix, p_total + lp[self.blank],
                    LOG0 if not prefix else pnb + lp[prefix[-1]], plm)
                lm_row = None
                for k in topk:
                    k = int(k)
                    if k == self.blank:
                        continue
                    if prefix and k == prefix[-1]:
                        p_new = pb + lp[k]
                    else:
                        p_new = p_total + lp[k]
                    plm_new = plm
                    if self.lm_fn is not None and self.lm_weight > 0:
                        if lm_row is None:
                            lm_row = self.lm_fn(prefix)
                        plm_new = plm + float(lm_row[k])
                    add(prefix + (k,), LOG0, p_new, plm_new)
            scored = sorted(
                new_beam.items(),
                key=lambda kv: -(_logsumexp(kv[1][0], kv[1][1])
                                 + self.lm_weight * kv[1][2]))
            self.beam = dict(scored[: self.beam_width])

    def hypotheses(self) -> list[dict]:
        out = []
        for prefix, (pb, pnb, plm) in self.beam.items():
            out.append({"hyp": self.committed + list(prefix),
                        "score": _logsumexp(pb, pnb) + self.lm_weight * plm})
        return sorted(out, key=lambda d: -d["score"])

    def commit_and_reset(self):
        best = self.hypotheses()[0]["hyp"]
        self.committed = best
        self._reset_beam()
        return best


class CTCPrefixScorer:
    """Watanabe-style joint CTC/attention prefix scorer (reference
    CTCPrefixScore ctc.py:756-871), vectorized over candidate tokens.

    Usage per utterance: init with [T, V] log probs; ``initial_state()``;
    ``__call__(hyp_ids, candidate_ids, state)`` -> (scores [n_cands], states).
    ``register_new_chunk`` extends T for block-synchronous streaming.
    """

    def __init__(self, log_probs: np.ndarray, blank: int = BLANK,
                 eos: int = EOS):
        self.lp = np.asarray(log_probs, np.float32)  # [T, V]
        self.blank = blank
        self.eos = eos
        self.T = self.lp.shape[0]

    def register_new_chunk(self, log_probs_chunk: np.ndarray):
        self.lp = np.concatenate([self.lp, np.asarray(log_probs_chunk)], 0)
        self.T = self.lp.shape[0]

    def extend_state(self, hyp: list[int], r_prev: np.ndarray) -> np.ndarray:
        """Extend a beam state over frames appended by
        ``register_new_chunk`` (block-synchronous decoding: the prefix is
        fixed, only T grows — reference CTCPrefixScore streaming usage,
        ctc.py:803-806)."""
        t_old = r_prev.shape[0]
        if t_old >= self.T:
            return r_prev
        r = np.concatenate(
            [r_prev, np.full((self.T - t_old, 2), LOG0, np.float32)], 0)
        last = hyp[-1] if hyp else -1
        for t in range(t_old, self.T):
            if last >= 0:
                r[t, 0] = r[t - 1, 0] + self.lp[t, last]
            r[t, 1] = np.logaddexp(r[t - 1, 0], r[t - 1, 1]) + \
                self.lp[t, self.blank]
        return r

    def initial_state(self):
        # r[t, 0]: prob of prefix ending in nonblank, r[t, 1]: in blank
        r = np.full((self.T, 2), LOG0, np.float32)
        r[0, 1] = self.lp[0, self.blank]
        for t in range(1, self.T):
            r[t, 1] = r[t - 1, 1] + self.lp[t, self.blank]
        return r

    def __call__(self, hyp: list[int], cands: np.ndarray, r_prev: np.ndarray):
        """Score extending ``hyp`` (without eos) by each candidate id.

        Returns (scores [n_cands] — log p(prefix+c..) for joint scoring,
        r_new [n_cands, T, 2]).
        """
        n = len(cands)
        T = self.T
        last = hyp[-1] if hyp else -1
        r = np.full((n, T, 2), LOG0, np.float32)
        # psi: accumulated prefix score per candidate
        r_sum_prev = np.logaddexp(r_prev[:, 0], r_prev[:, 1])  # [T]
        lp_c = self.lp[:, cands]                                # [T, n]
        start = max(len(hyp), 1)
        psi = np.full(n, LOG0, np.float32)
        if len(hyp) == 0:
            r[:, 0, 0] = lp_c[0]
            psi = r[:, 0, 0].copy()
        phi = np.where(np.asarray(cands)[None, :] == last,
                       r_prev[:, 1:2], r_sum_prev[:, None])     # [T, n]
        for t in range(start, T):
            r[:, t, 0] = np.logaddexp(r[:, t - 1, 0], phi[t - 1]) + lp_c[t]
            r[:, t, 1] = np.logaddexp(r[:, t - 1, 0], r[:, t - 1, 1]) + \
                self.lp[t, self.blank]
            psi = np.logaddexp(psi, phi[t - 1] + lp_c[t])
        # eos candidate scores the full prefix probability
        is_eos = np.asarray(cands) == self.eos
        if is_eos.any():
            psi[is_eos] = np.logaddexp(r_prev[-1, 0], r_prev[-1, 1])
        return psi, r
