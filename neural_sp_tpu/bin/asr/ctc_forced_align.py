"""CTC forced alignment CLI (reference
``neural_sp/bin/asr/ctc_forced_align.py:26+``): writes per-utterance token
trigger frames, consumed back by MoChA latency-loss training via
--train_ctc_alignment (reference dataset.py:256-262)."""
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


def main(argv=None):
    args = parse_args_eval(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.INFO)
    model, params, targs, save_dir = load_model_for_eval(args)
    out_dir = getattr(args, "align_dir", os.path.join(save_dir, "align"))
    os.makedirs(out_dir, exist_ok=True)
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    for tsv in sets:
        loader = build_dataloader(
            tsv, dict_path=targs.dict, unit=targs.unit,
            wp_model=getattr(targs, "wp_model", None),
            batch_size=getattr(args, "recog_batch_size", 4), is_test=True)
        out_path = os.path.join(
            out_dir, os.path.basename(tsv).replace(".tsv", ".align"))
        with open(out_path, "w") as f:
            for batch in loader:
                eouts, _ = model.apply(
                    {"params": params}, jnp.asarray(batch["xs"]),
                    jnp.asarray(batch["xlens"]), method=model.encode)
                trig = np.asarray(model.apply(
                    {"params": params}, eouts["ys"]["xs"],
                    eouts["ys"]["xlens"], jnp.asarray(batch["ys"]),
                    jnp.asarray(batch["ylens"]),
                    method=lambda m, *a: m.ctc.trigger_points(*a)))
                for b, utt_id in enumerate(batch["utt_ids"]):
                    u = int(batch["ylens"][b])
                    f.write(utt_id + " " +
                            " ".join(map(str, trig[b, :u])) + "\n")
        logger.info("wrote alignments to %s", out_path)
    return out_dir


if __name__ == "__main__":
    main()
