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
        import re
        avail = [int(m.group(1)) for d in os.listdir(save_dir)
                 if (m := re.match(r"ckpt\.epoch-(\d+)$", d))]
        # metric-ranked top-k from the training history (reference
        # eval_utils.py:33-78 averages the BEST checkpoints, not the last);
        # falls back to last-n when no history exists
        epochs = None
        hist = os.path.join(save_dir, "history.csv")
        if os.path.exists(hist):
            import csv
            rows = [r for r in csv.DictReader(open(hist))
                    if r.get("dev_loss_mean")]
            ranked = sorted(
                (float(r["dev_loss_mean"]), int(r["epoch"])) for r in rows
                if int(r["epoch"]) in avail)
            if ranked:
                epochs = sorted(e for _, e in ranked[:n_avg])
        if not epochs:
            epochs = sorted(avail)[-n_avg:]
        params = average_checkpoints(save_dir, epochs)
        logger.info("averaged %d checkpoints (metric top-k): %s",
                    len(epochs), epochs)
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
        softmax_smoothing=args.recog_softmax_smoothing,
        n_best=max(getattr(args, "recog_n_best", 1),
                   10 if (getattr(args, "recog_lm_second", "") or
                          getattr(args, "recog_lm_bwd", "")) else 1),
        lm_second_weight=getattr(args, "recog_lm_second_weight", 0.3),
        lm_bwd_weight=getattr(args, "recog_lm_bwd_weight", 0.3),
        fwd_bwd_attention=bool(getattr(args, "recog_fwd_bwd_attention",
                                       False)),
        device_beam=bool(getattr(args, "recog_device_beam", False)))
    lm_session = build_lm_session(getattr(args, "recog_lm", ""),
                                  args.recog_lm_weight)

    # ensemble decoding (reference las.py:1219-1237, eval.py ensemble
    # loading): each extra model dir becomes a member session whose
    # per-step log-probs are averaged into the beam
    ensemble = []
    ens_dirs = getattr(args, "recog_ensemble", []) or []
    if isinstance(ens_dirs, str):
        ens_dirs = [ens_dirs]
    for d in ens_dirs:
        from types import SimpleNamespace
        em, ep, _, _ = load_model_for_eval(SimpleNamespace(
            recog_model=d, recog_n_average=getattr(args, "recog_n_average",
                                                   1)))
        ensemble.append(Speech2TextSession(em, ep, conf))
    session = Speech2TextSession(model, params, conf, lm_session,
                                 ensemble=ensemble)

    # second-pass / backward LM rescoring over the n-best (reference
    # bin/asr/eval.py:64-79 + beam_search.py:115-140)
    lm_second = build_lm_session(getattr(args, "recog_lm_second", ""),
                                 conf.lm_second_weight)
    lm_bwd = build_lm_session(getattr(args, "recog_lm_bwd", ""),
                              conf.lm_bwd_weight)
    if lm_second is not None or lm_bwd is not None:
        session.attach_second_pass_lms(lm_second, lm_bwd)

    results = {}
    sets = args.recog_sets if isinstance(args.recog_sets, list) \
        else [args.recog_sets]
    streaming = bool(getattr(args, "recog_streaming", False) or
                     getattr(args, "recog_block_sync", False))
    for tsv in sets:
        loader = build_dataloader(
            tsv, dict_path=getattr(args, "recog_dict", None) or targs.dict,
            unit=targs.unit, wp_model=getattr(targs, "wp_model", None),
            batch_size=args.recog_batch_size, bucketing="sort", is_test=True)
        out_dir = os.path.join(getattr(args, "recog_dir", save_dir),
                               os.path.basename(tsv).replace(".tsv", ""))
        if streaming:
            # streaming dispatch (reference evaluators/wordpiece.py:80-84):
            # block-sync beam for CTC / RNN-T / MoChA + VAD resets
            from ...evaluators.asr import eval_streaming
            m = eval_streaming(session, loader, save_dir=out_dir)
            logger.info(
                "%s (streaming): WER %.2f (RTF %.4f, quantity rate %.3f, "
                "%d resets, %d utts)", tsv, m["wer"], m["rtf"],
                m["quantity_rate"], m["n_resets"], m["n_utts"])
        elif getattr(args, "recog_oracle", False):
            from ...evaluators.asr import eval_oracle_wer
            m = eval_oracle_wer(session, loader)
            logger.info("%s: oracle WER %.2f (%d utts)", tsv,
                        m["oracle_wer"], m["n_utts"])
        else:
            m = eval_unit(session, loader, targs.unit, save_dir=out_dir,
                          phone_map=getattr(args, "recog_phone_map", "")
                          or None)
            if getattr(args, "recog_wer_by_length", False):
                from ...evaluators.asr import eval_wer_by_length
                m.update(eval_wer_by_length(session, loader))
            logger.info("%s: WER %.2f / CER %.2f (RTF %.4f, %d utts)",
                        tsv, m["wer"], m["cer"], m["rtf"], m["n_utts"])
        results[tsv] = m
    return results


if __name__ == "__main__":
    main()
