"""ASR evaluation CLI (reference ``neural_sp/bin/asr/eval.py:37-203``):
loads conf.yml next to the checkpoint, checkpoint averaging, optional LM for
fusion/rescoring, per-set WER/CER + RTF."""
from __future__ import annotations

import logging
import os
import sys

import jax

from ..args import parse_args_eval, load_config
from ...datasets.asr.build import build_dataloader
from ...models.speech2text import build_speech2text
from ...models.decoders.decoding import Speech2TextSession, DecodeConfig
from ...trainers.checkpoint import (
    load_checkpoint, latest_epoch, average_checkpoints)
from ...evaluators.asr import eval_unit

logger = logging.getLogger(__name__)


def load_model_for_eval(args):
    """(model, params) from --recog_model dir/path with optional averaging."""
    from types import SimpleNamespace
    model_path = args.recog_model
    save_dir = model_path if os.path.isdir(model_path) and not \
        os.path.basename(model_path).startswith("ckpt.") else \
        os.path.dirname(model_path)
    conf = load_config(os.path.join(save_dir, "conf.yml"))
    targs = SimpleNamespace(**conf)
    model = build_speech2text(targs)
    n_avg = getattr(args, "recog_n_average", 1)
    last = latest_epoch(save_dir)
    if n_avg > 1 and last is not None:
        epochs = list(range(max(last - n_avg + 1, 1), last + 1))
        import re
        avail = [int(m.group(1)) for d in os.listdir(save_dir)
                 if (m := re.match(r"ckpt\.epoch-(\d+)$", d))]
        epochs = sorted(set(epochs) & set(avail)) or avail[-n_avg:]
        params = average_checkpoints(save_dir, epochs)
        logger.info("averaged %d checkpoints: %s", len(epochs), epochs)
    else:
        path = model_path if os.path.basename(model_path).startswith(
            "ckpt.") else os.path.join(save_dir, f"ckpt.epoch-{last}")
        params = load_checkpoint(path)["params"]
    return model, params, targs, save_dir


def build_lm_session(lm_dir: str, weight: float):
    if not lm_dir or weight == 0:
        return None
    from types import SimpleNamespace
    from ...models.lm.build import build_lm
    from ...models.lm.session import LMSession
    conf = load_config(os.path.join(lm_dir, "conf.yml"))
    lm = build_lm(SimpleNamespace(**conf))
    last = latest_epoch(lm_dir)
    params = load_checkpoint(
        os.path.join(lm_dir, f"ckpt.epoch-{last}"))["params"]
    return LMSession(lm, params)


def main(argv=None):
    args = parse_args_eval(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(level=logging.INFO)
    model, params, targs, save_dir = load_model_for_eval(args)

    conf = DecodeConfig(
        beam_width=args.recog_beam_width,
        max_len_ratio=args.recog_max_len_ratio,
        min_len_ratio=args.recog_min_len_ratio,
        length_penalty=args.recog_length_penalty,
        length_norm=bool(args.recog_length_norm),
        coverage_penalty=args.recog_coverage_penalty,
        coverage_threshold=args.recog_coverage_threshold,
        eos_threshold=args.recog_eos_threshold,
        ctc_weight=args.recog_ctc_weight,
        lm_weight=args.recog_lm_weight,
        state_carry_over=bool(getattr(args, "recog_state_carry_over",
                                      False)),
        ilm_weight=args.recog_ilm_weight,
        softmax_smoothing=args.recog_softmax_smoothing)
    lm_session = build_lm_session(getattr(args, "recog_lm", ""),
                                  args.recog_lm_weight)
    session = Speech2TextSession(model, params, conf, lm_session)

    results = {}
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    for tsv in sets:
        loader = build_dataloader(
            tsv, dict_path=getattr(args, "recog_dict", None) or targs.dict,
            unit=targs.unit, wp_model=getattr(targs, "wp_model", None),
            batch_size=args.recog_batch_size, bucketing="sort", is_test=True)
        out_dir = os.path.join(getattr(args, "recog_dir", save_dir),
                               os.path.basename(tsv).replace(".tsv", ""))
        m = eval_unit(session, loader, targs.unit, save_dir=out_dir)
        logger.info("%s: WER %.2f / CER %.2f (RTF %.4f, %d utts)",
                    tsv, m["wer"], m["cer"], m["rtf"], m["n_utts"])
        results[tsv] = m
    return results


if __name__ == "__main__":
    main()
