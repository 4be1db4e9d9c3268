"""LM evaluation CLI (reference ``neural_sp/bin/lm/eval.py``): PPL per set,
optional cache model."""
from __future__ import annotations

import logging
import os
import sys
from types import SimpleNamespace

from ..args import parse_cli, load_config
from ...datasets.lm import LMDataset
from ...models.lm.build import build_lm
from ...models.lm.session import LMSession
from ...trainers.checkpoint import load_checkpoint, latest_epoch
from ...evaluators.ppl import eval_ppl

logger = logging.getLogger(__name__)


def main(argv=None):
    args = parse_cli(argv if argv is not None else sys.argv[1:],
                     dict(recog_n_caches=0, recog_cache_lambda=0.2,
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

    results = {}
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    for tsv in sets:
        ds = LMDataset(tsv, dict_path=targs.dict, unit=targs.unit,
                       wp_model=getattr(targs, "wp_model", None),
                       batch_size=getattr(targs, "batch_size", 32),
                       bptt=getattr(targs, "bptt", 64))
        if args.recog_n_caches > 0:
            sess = LMSession(lm, params, cache_size=args.recog_n_caches,
                             cache_lambda=args.recog_cache_lambda,
                             cache_theta=args.recog_cache_theta)
            stream = list(ds.xs[0]) if ds.xs.size else []
            from ...evaluators.ppl import eval_ppl_cache
            m = eval_ppl_cache(sess, stream)
        else:
            m = eval_ppl(lm, params, ds)
        logger.info("%s: PPL %.2f", tsv, m["ppl"])
        results[tsv] = m
    return results


if __name__ == "__main__":
    main()
