"""Frame stacking / skipping (reference
``neural_sp/models/seq2seq/frontends/frame_stacking.py:10-69``): stack
``n_stacks`` consecutive frames, emit every ``n_skips`` — host-side numpy,
applied per utterance before batching (as in the reference)."""
from __future__ import annotations

import numpy as np


def stack_frame(feat: np.ndarray, n_stacks: int, n_skips: int,
                dtype=np.float32) -> np.ndarray:
    """[T, D] -> [ceil(T/n_skips), D*n_stacks]."""
    if n_stacks == 1 and n_skips == 1:
        return feat.astype(dtype)
    t, d = feat.shape
    n_out = -(-t // n_skips)
    out = np.zeros((n_out, d * n_stacks), dtype)
    for i in range(n_out):
        for s in range(n_stacks):
            idx = i * n_skips + s
            if idx < t:
                out[i, s * d:(s + 1) * d] = feat[idx]
    return out
