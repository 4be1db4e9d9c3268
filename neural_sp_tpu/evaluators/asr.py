"""ASR evaluators: WER/CER/PER over a dataloader + trn transcript files.

Reference: ``neural_sp/evaluators/{wordpiece,character,word,phone}.py`` —
shared shape: loop over the eval set, decode, convert ids -> text, compute
corpus WER/CER with S/I/D accounting, write ref.trn/hyp.trn, report RTF.
"""
from __future__ import annotations

import codecs
import os
import time

import numpy as np

from .edit_distance import compute_wer, compute_cer


def _decode_batches(session, loader, progress=False):
    t_start = time.time()
    n_frames = 0
    for batch in loader:
        hyps = session.decode(batch["xs"], batch["xlens"])
        n_frames += int(np.sum(batch["xlens"]))
        for i in range(len(batch["utt_ids"])):
            yield batch["utt_ids"][i], batch["speakers"][i], \
                batch["text"][i], hyps[i]
    elapsed = time.time() - t_start
    _decode_batches.rtf = elapsed / max(n_frames * 0.01, 1e-6)


def eval_unit(
    session,
    loader,
    unit: str = "char",
    save_dir: str | None = None,
    progress: bool = False,
) -> dict:
    """Returns metrics dict {wer, cer, n_sub, n_ins, n_del, rtf, n_utts}."""
    idx2token = loader.idx2token
    n_w_err = n_w_tok = 0
    n_sub = n_ins = n_del = 0
    cer_num = cer_den = 0
    n_utts = 0
    ref_f = hyp_f = None
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        ref_f = codecs.open(os.path.join(save_dir, "ref.trn"), "w", "utf-8")
        hyp_f = codecs.open(os.path.join(save_dir, "hyp.trn"), "w", "utf-8")

    for utt_id, spk, ref_text, hyp_ids in _decode_batches(
            session, loader, progress):
        hyp_text = idx2token(hyp_ids)
        if ref_f:
            ref_f.write(f"{ref_text} ({spk}-{utt_id})\n")
            hyp_f.write(f"{hyp_text} ({spk}-{utt_id})\n")
        if unit == "phone":
            ref_toks, hyp_toks = ref_text.split(), hyp_text.split()
        else:
            ref_toks, hyp_toks = ref_text.split(), hyp_text.split()
        _, s, i, d = compute_wer(ref_toks, hyp_toks)
        n_w_err += s + i + d
        n_w_tok += len(ref_toks)
        n_sub += s; n_ins += i; n_del += d
        # CER on concatenated chars
        r = ref_text.replace(" ", "")
        h = hyp_text.replace(" ", "")
        _, cs, ci, cd = compute_wer(list(r), list(h))
        cer_num += cs + ci + cd
        cer_den += len(r)
        n_utts += 1

    if ref_f:
        ref_f.close(); hyp_f.close()
    return {
        "wer": 100.0 * n_w_err / max(n_w_tok, 1),
        "cer": 100.0 * cer_num / max(cer_den, 1),
        "n_sub": n_sub, "n_ins": n_ins, "n_del": n_del,
        "rtf": getattr(_decode_batches, "rtf", 0.0),
        "n_utts": n_utts,
    }


def eval_wordpiece(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "wp", save_dir, progress)


def eval_char(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "char", save_dir, progress)


def eval_word(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "word", save_dir, progress)


def eval_phone(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "phone", save_dir, progress)
