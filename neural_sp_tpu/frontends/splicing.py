"""Context splicing (reference
``neural_sp/models/seq2seq/frontends/splicing.py:10-64``): concatenate
+-n_splices context frames for CNN-less encoders (host-side numpy)."""
from __future__ import annotations

import numpy as np


def splice(feat: np.ndarray, n_splices: int = 1) -> np.ndarray:
    """[T, D] -> [T, D*(2*n_splices+1)] with edge clamping."""
    if n_splices == 0:
        return feat
    t, d = feat.shape
    out = np.zeros((t, d * (2 * n_splices + 1)), feat.dtype)
    for k, off in enumerate(range(-n_splices, n_splices + 1)):
        idx = np.clip(np.arange(t) + off, 0, t - 1)
        out[:, k * d:(k + 1) * d] = feat[idx]
    return out
