"""Edit distance / WER with S-I-D backtrace and aligned printout.

Reference: ``neural_sp/evaluators/edit_distance.py`` (compute_wer :56-135,
wer_align). Dependency-free replacement for python-Levenshtein (the
reference's C extension) — numpy DP is plenty for host-side scoring.
"""
from __future__ import annotations

import numpy as np


def compute_wer(ref: list, hyp: list) -> tuple[float, int, int, int]:
    """Returns (wer%, n_sub, n_ins, n_del) on token lists."""
    nr, nh = len(ref), len(hyp)
    if nr + nh > 64:  # native C++ path pays off past trivial sizes
        from ..utils.native import edit_distance as _native_ed
        interned: dict = {}
        ids = lambda toks: [interned.setdefault(t, len(interned))
                            for t in toks]
        out = _native_ed(ids(ref), ids(hyp))
        if out is not None:
            tot, s, i, d = out
            return 100.0 * tot / max(nr, 1), s, i, d
    d = np.zeros((nr + 1, nh + 1), np.int32)
    d[:, 0] = np.arange(nr + 1)
    d[0, :] = np.arange(nh + 1)
    for i in range(1, nr + 1):
        for j in range(1, nh + 1):
            sub = d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    # backtrace for S/I/D counts
    i, j = nr, nh
    n_sub = n_ins = n_del = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] and \
                ref[i - 1] == hyp[j - 1]:
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            n_sub += 1
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            n_del += 1
            i -= 1
        else:
            n_ins += 1
            j -= 1
    wer = 100.0 * (n_sub + n_ins + n_del) / max(nr, 1)
    return wer, n_sub, n_ins, n_del


def compute_cer(ref: str, hyp: str) -> float:
    """Character error rate (%) on strings (spaces removed, reference
    convention)."""
    r = list(ref.replace(" ", ""))
    h = list(hyp.replace(" ", ""))
    return compute_wer(r, h)[0]


def compute_per(ref: list, hyp: list) -> float:
    return compute_wer(ref, hyp)[0]


def wer_align(ref: list, hyp: list) -> str:
    """Aligned REF/HYP printout with S/I/D markers."""
    nr, nh = len(ref), len(hyp)
    d = np.zeros((nr + 1, nh + 1), np.int32)
    d[:, 0] = np.arange(nr + 1)
    d[0, :] = np.arange(nh + 1)
    for i in range(1, nr + 1):
        for j in range(1, nh + 1):
            d[i, j] = min(d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                          d[i - 1, j] + 1, d[i, j - 1] + 1)
    i, j = nr, nh
    pairs = []
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] and \
                ref[i - 1] == hyp[j - 1]:
            pairs.append((str(ref[i - 1]), str(hyp[j - 1]), " "))
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            pairs.append((str(ref[i - 1]), str(hyp[j - 1]), "S"))
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            pairs.append((str(ref[i - 1]), "*", "D"))
            i -= 1
        else:
            pairs.append(("*", str(hyp[j - 1]), "I"))
            j -= 1
    pairs.reverse()
    w = [max(len(a), len(b)) for a, b, _ in pairs]
    ref_l = " ".join(a.ljust(n) for (a, _, _), n in zip(pairs, w))
    hyp_l = " ".join(b.ljust(n) for (_, b, _), n in zip(pairs, w))
    op_l = " ".join(o.ljust(n) for (_, _, o), n in zip(pairs, w))
    return f"REF: {ref_l}\nHYP: {hyp_l}\nOP : {op_l}"
