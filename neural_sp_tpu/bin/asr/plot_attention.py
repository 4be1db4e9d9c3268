"""Attention heatmap plotting CLI (reference
``neural_sp/bin/asr/plot_attention.py:32+``): teacher-forced forward with
return_logits, renders per-utterance attention weight PNGs."""
from __future__ import annotations

import logging
import os
import sys

import numpy as np
import jax.numpy as jnp

from ..args import parse_args_eval
from ...datasets.asr.build import build_dataloader
from .eval import load_model_for_eval

logger = logging.getLogger(__name__)


def plot_attention_for_batch(model, params, batch, save_dir: str,
                             idx2token=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_dir, exist_ok=True)
    eouts, _ = model.apply({"params": params}, jnp.asarray(batch["xs"]),
                           jnp.asarray(batch["xlens"]), method=model.encode)
    ex, el = eouts["ys"]["xs"], eouts["ys"]["xlens"]
    _, obs = model.apply(
        {"params": params}, ex, el, jnp.asarray(batch["ys"]),
        jnp.asarray(batch["ylens"]), True, None, True,
        method=lambda m, *a: m.dec_fwd(*a))
    aws = np.asarray(obs["aws"])  # [B, U, Tk] or [B, U, H, Tk]
    paths = []
    for b, utt_id in enumerate(batch["utt_ids"]):
        aw = aws[b]
        if aw.ndim == 3:
            aw = aw.mean(1)
        u = int(batch["ylens"][b]) + 1
        t = int(el[b])
        plt.figure(figsize=(8, 4))
        plt.imshow(aw[:u, :t], aspect="auto", origin="lower",
                   interpolation="nearest")
        plt.xlabel("encoder frames")
        plt.ylabel("output tokens")
        plt.title(utt_id)
        p = os.path.join(save_dir, f"{utt_id}.png")
        plt.savefig(p)
        plt.close()
        paths.append(p)
    return paths


def main(argv=None):
    args = parse_args_eval(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.INFO)
    model, params, targs, save_dir = load_model_for_eval(args)
    out_dir = getattr(args, "plot_dir", os.path.join(save_dir, "att_weights"))
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    all_paths = []
    for tsv in sets:
        loader = build_dataloader(
            tsv, dict_path=targs.dict, unit=targs.unit,
            wp_model=getattr(targs, "wp_model", None),
            batch_size=getattr(args, "recog_batch_size", 4), is_test=True)
        for batch in loader:
            all_paths += plot_attention_for_batch(
                model, params, batch, out_dir, loader.idx2token)
            break  # first batch per set (parity with reference sampling)
    logger.info("wrote %d attention plots to %s", len(all_paths), out_dir)
    return all_paths


if __name__ == "__main__":
    main()
