"""Corpus BLEU evaluator (reference ``neural_sp/evaluators/wordpiece_bleu.py``
uses nltk; this is a dependency-free corpus-BLEU with the standard smoothing-
free formulation + brevity penalty)."""
from __future__ import annotations

import math
from collections import Counter


def _ngrams(toks, n):
    return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))


def corpus_bleu(refs: list[list], hyps: list[list], max_n: int = 4) -> float:
    """BLEU-4 (%) over token lists."""
    p_num = [0] * max_n
    p_den = [0] * max_n
    ref_len = hyp_len = 0
    for ref, hyp in zip(refs, hyps):
        ref_len += len(ref)
        hyp_len += len(hyp)
        for n in range(1, max_n + 1):
            h = _ngrams(hyp, n)
            r = _ngrams(ref, n)
            p_num[n - 1] += sum(min(c, r[g]) for g, c in h.items())
            p_den[n - 1] += max(sum(h.values()), 0)
    if hyp_len == 0 or p_num[0] == 0:
        return 0.0
    # epsilon smoothing for zero higher-order counts; orders with no
    # hypothesis n-grams at all are skipped (short-corpus degenerate case)
    logs = [math.log(max(n, 0.1) / d) for n, d in zip(p_num, p_den) if d > 0]
    log_p = sum(logs) / len(logs)
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / hyp_len)
    return 100.0 * bp * math.exp(log_p)


def eval_wordpiece_bleu(session, loader, save_dir=None) -> dict:
    from .asr import _decode_batches
    refs, hyps = [], []
    for utt_id, spk, ref_text, hyp_ids in _decode_batches(session, loader):
        refs.append(ref_text.split())
        hyps.append(loader.idx2token(hyp_ids).split())
    return {"bleu": corpus_bleu(refs, hyps), "n_utts": len(refs)}
