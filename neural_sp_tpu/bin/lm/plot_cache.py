"""Cache-model visualisation CLI (reference ``neural_sp/bin/lm/plot_cache.py``):
plots the unigram-cache attention weights over a token stream for a trained
LM."""
from __future__ import annotations

import logging
import os
import sys
from types import SimpleNamespace

import numpy as np

from ..args import parse_cli, load_config
from ...datasets.lm import LMDataset
from ...models.lm.build import build_lm
from ...models.lm.session import LMSession
from ...trainers.checkpoint import load_checkpoint, latest_epoch

logger = logging.getLogger(__name__)


def plot_cache_weights(session: LMSession, stream: list[int],
                       out_path: str, n_tokens: int = 50):
    """Render cache attention over the last cache_size hiddens per step."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    state = session.initial_state(1)
    hist_h, weights = [], []
    for t in range(min(len(stream) - 1, n_tokens)):
        _, state, h = session.predict_with_hidden(
            np.asarray([stream[t]], np.int32), state)
        if hist_h:
            hs = np.stack(hist_h[-session.cache_size:])
            att = np.exp(session.cache_theta * (hs @ h[0]))
            att /= att.sum()
            row = np.zeros(n_tokens)
            row[max(t - session.cache_size, 0): t] = att[-t:] if t else []
            weights.append(row)
        else:
            weights.append(np.zeros(n_tokens))
        hist_h.append(h[0])
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    plt.figure(figsize=(8, 6))
    plt.imshow(np.stack(weights), aspect="auto", origin="lower",
               interpolation="nearest")
    plt.xlabel("cache position")
    plt.ylabel("step")
    plt.colorbar()
    plt.savefig(out_path)
    plt.close()
    return out_path


def main(argv=None):
    args = parse_cli(argv if argv is not None else sys.argv[1:],
                     dict(recog_n_caches=100, recog_cache_lambda=0.2,
                          recog_cache_theta=0.3))
    logging.basicConfig(level=logging.INFO)
    lm_dir = args.recog_model if os.path.isdir(args.recog_model) else \
        os.path.dirname(args.recog_model)
    conf = load_config(os.path.join(lm_dir, "conf.yml"))
    targs = SimpleNamespace(**conf)
    lm = build_lm(targs)
    last = latest_epoch(lm_dir)
    params = load_checkpoint(
        os.path.join(lm_dir, f"ckpt.epoch-{last}"))["params"]
    session = LMSession(lm, params, cache_size=args.recog_n_caches,
                        cache_lambda=args.recog_cache_lambda,
                        cache_theta=args.recog_cache_theta)
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    out = []
    for tsv in sets:
        ds = LMDataset(tsv, dict_path=targs.dict, unit=targs.unit,
                       wp_model=getattr(targs, "wp_model", None),
                       batch_size=1, bptt=64)
        stream = list(ds.xs[0]) if ds.xs.size else []
        p = os.path.join(lm_dir, "cache",
                         os.path.basename(tsv).replace(".tsv", ".png"))
        out.append(plot_cache_weights(session, stream, p))
        logger.info("wrote %s", out[-1])
    return out


if __name__ == "__main__":
    main()
