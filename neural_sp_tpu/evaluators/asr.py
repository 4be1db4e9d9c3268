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
        if getattr(session.conf, "state_carry_over", False):
            hyps = session.decode(
                {"xs": batch["xs"], "xlens": batch["xlens"],
                 "speakers": batch["speakers"]}, None)
        else:
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


def eval_oracle_wer(session, loader) -> dict:
    """Oracle WER over the n-best (reference wordpiece.py:127-134)."""
    idx2token = loader.idx2token
    n_err = n_tok = 0
    n_utts = 0
    for batch in loader:
        eouts_all = session.encode(batch["xs"], batch["xlens"])
        session._ens_eouts = []
        for b in range(len(batch["utt_ids"])):
            session._b_idx = b
            e = eouts_all["ys"]["xs"][b:b + 1]
            el = eouts_all["ys"]["xlens"][b:b + 1]
            from .edit_distance import compute_wer as _wer
            from ..models.decoders.transformer import TransformerDecoder
            if isinstance(session.dec, TransformerDecoder):
                _, nbest = session._beam_one_transformer(e, el)
            else:
                _, nbest = session._beam_one_las(e, el)
            ref = batch["text"][b].split()
            best = min(
                (_wer(ref, idx2token(h).split()) for h in nbest),
                key=lambda t: t[0])
            n_err += best[1] + best[2] + best[3]
            n_tok += len(ref)
            n_utts += 1
    return {"oracle_wer": 100.0 * n_err / max(n_tok, 1), "n_utts": n_utts}


def eval_wer_by_length(session, loader, bins=(0, 10, 20, 40, 10**9)) -> dict:
    """Fine-grained WER by reference-length bins (reference wordpiece.py)."""
    stats = {i: [0, 0] for i in range(len(bins) - 1)}
    for utt_id, spk, ref_text, hyp_ids in _decode_batches(session, loader):
        ref = ref_text.split()
        hyp = loader.idx2token(hyp_ids).split()
        _, s, i, d = compute_wer(ref, hyp)
        for k in range(len(bins) - 1):
            if bins[k] <= len(ref) < bins[k + 1]:
                stats[k][0] += s + i + d
                stats[k][1] += len(ref)
    return {f"wer_len_{bins[k]}_{bins[k+1]}":
            100.0 * e / max(t, 1) for k, (e, t) in stats.items()}


def eval_streaming(session, loader, save_dir=None) -> dict:
    """Streaming decode evaluation: WER + RTF + quantity rate +
    streamability diagnostics (reference wordpiece.py:155-208)."""
    idx2token = loader.idx2token
    n_err = n_tok = n_hyp_tok = 0
    rtfs = []
    n_resets_total = 0
    n_utts = 0
    for batch in loader:
        for b in range(len(batch["utt_ids"])):
            feats = batch["xs"][b][: batch["xlens"][b]]
            hyp_ids, stats = session.decode_streaming(feats)
            ref = batch["text"][b].split()
            hyp = idx2token(hyp_ids).split()
            _, s, i, d = compute_wer(ref, hyp)
            n_err += s + i + d
            n_tok += len(ref)
            n_hyp_tok += len(hyp_ids)
            rtfs.append(stats["rtf"])
            n_resets_total += stats["n_resets"]
            n_utts += 1
    return {"wer": 100.0 * n_err / max(n_tok, 1),
            "rtf": float(sum(rtfs) / max(len(rtfs), 1)),
            "quantity_rate": n_hyp_tok / max(n_tok, 1),
            "n_resets": n_resets_total, "n_utts": n_utts}


def eval_wordpiece(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "wp", save_dir, progress)


def eval_char(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "char", save_dir, progress)


def eval_word(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "word", save_dir, progress)


def eval_phone(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "phone", save_dir, progress)
