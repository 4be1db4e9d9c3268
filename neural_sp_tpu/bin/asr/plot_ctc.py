"""CTC posterior plotting CLI (reference ``neural_sp/bin/asr/plot_ctc.py``)."""
from __future__ import annotations

import logging
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..args import parse_args_eval
from ...datasets.asr.build import build_dataloader
from .eval import load_model_for_eval

logger = logging.getLogger(__name__)


def plot_ctc_for_batch(model, params, batch, save_dir: str, topk: int = 10):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_dir, exist_ok=True)
    eouts, _ = model.apply({"params": params}, jnp.asarray(batch["xs"]),
                           jnp.asarray(batch["xlens"]), method=model.encode)
    probs = np.asarray(jnp.exp(model.apply(
        {"params": params}, eouts["ys"]["xs"],
        method=lambda m, e: m.ctc.log_probs(e))))
    el = np.asarray(eouts["ys"]["xlens"])
    paths = []
    for b, utt_id in enumerate(batch["utt_ids"]):
        p = probs[b, : el[b]]
        top_ids = np.argsort(p.max(0))[::-1][:topk]
        plt.figure(figsize=(10, 4))
        for k in top_ids:
            style = "--" if k == 0 else "-"
            plt.plot(p[:, k], style, label=str(k))
        plt.ylim(0, 1)
        plt.xlabel("frames")
        plt.ylabel("posterior")
        plt.title(utt_id)
        plt.legend(ncol=5, fontsize=6)
        out = os.path.join(save_dir, f"{utt_id}_ctc.png")
        plt.savefig(out)
        plt.close()
        paths.append(out)
    return paths


def main(argv=None):
    args = parse_args_eval(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.INFO)
    model, params, targs, save_dir = load_model_for_eval(args)
    out_dir = getattr(args, "plot_dir", os.path.join(save_dir, "ctc_probs"))
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    all_paths = []
    for tsv in sets:
        loader = build_dataloader(
            tsv, dict_path=targs.dict, unit=targs.unit,
            wp_model=getattr(targs, "wp_model", None),
            batch_size=getattr(args, "recog_batch_size", 4), is_test=True)
        for batch in loader:
            all_paths += plot_ctc_for_batch(model, params, batch, out_dir)
            break
    logger.info("wrote %d CTC plots to %s", len(all_paths), out_dir)
    return all_paths


if __name__ == "__main__":
    main()
