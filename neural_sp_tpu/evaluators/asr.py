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
    phone_map: str | None = None,
) -> dict:
    """Returns metrics dict {wer, cer, n_sub, n_ins, n_del, rtf, n_utts}.

    phone_map: 'timit_39' / 'timit_48' reduces ref+hyp phone tokens to the
    standard TIMIT scoring classes before PER, like the reference's
    score.sh -> timit_norm_trans.pl pipeline (examples/timit/s5).
    """
    idx2token = loader.idx2token
    norm = None
    if phone_map:
        from ..utils.scoring import timit_norm_trans
        to = int(phone_map.rsplit("_", 1)[1])
        norm = lambda toks: timit_norm_trans(toks, to=to)
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
        ref_toks, hyp_toks = ref_text.split(), hyp_text.split()
        if norm is not None:
            ref_toks, hyp_toks = norm(ref_toks), norm(hyp_toks)
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
    streamability diagnostics (reference wordpiece.py:155-208 +
    las.py:1386-1435): ``streamability`` is the fraction of utterances
    whose every token boundary fired before the final encoder frame
    arrived; ``last_success_frame_ratio`` is the mean position of the last
    emitted boundary relative to the utterance end."""
    idx2token = loader.idx2token
    n_err = n_tok = n_hyp_tok = 0
    rtfs = []
    n_resets_total = 0
    n_utts = 0
    n_streamable = 0
    lsf_ratios = []
    has_diag = False
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
            bounds = stats.get("boundaries")
            t_out = stats.get("n_out_frames", 0)
            if bounds is not None:
                has_diag = True
                if bounds and t_out:
                    lsf_ratios.append(bounds[-1] / max(t_out, 1))
                    if bounds[-1] < t_out - 1:
                        n_streamable += 1
                # an utterance with NO boundaries is non-streamable
            n_utts += 1
    out = {"wer": 100.0 * n_err / max(n_tok, 1),
           "rtf": float(sum(rtfs) / max(len(rtfs), 1)),
           "quantity_rate": n_hyp_tok / max(n_tok, 1),
           "n_resets": n_resets_total, "n_utts": n_utts}
    if has_diag:
        out["streamability"] = n_streamable / max(n_utts, 1)
        if lsf_ratios:
            out["last_success_frame_ratio"] = float(
                sum(lsf_ratios) / len(lsf_ratios))
    return out


def eval_wordpiece(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "wp", save_dir, progress)


def eval_char(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "char", save_dir, progress)


def resolve_unk_text(hyp_ids, peaks, idx2word, char_path, char_frames,
                     idx2char, unk_id: int = 1) -> str:
    """Replace ``<unk>`` word tokens with character substrings recovered
    from the char-level CTC path, aligned by attention-peak frames
    (reference ``evaluators/resolving_unk.py`` + word.py wiring).

    char_path/char_frames: collapsed char ids and their first-emission
    frames. Each <unk> at word position i takes the chars whose frames lie
    between the midpoints to the neighbouring words' peaks.
    """
    words = idx2word(hyp_ids).split()
    if len(words) != len(hyp_ids):
        # idx2word may merge; fall back to per-id conversion
        words = [idx2word([t]) for t in hyp_ids]
    out = []
    for i, (tok, w) in enumerate(zip(hyp_ids, words)):
        if tok != unk_id or not peaks:
            out.append(w)
            continue
        peak = peaks[min(i, len(peaks) - 1)]
        lo = (peaks[i - 1] + peak) / 2 if i > 0 else -1
        hi = (peak + peaks[i + 1]) / 2 if i + 1 < len(peaks) else 10**9
        chars = [idx2char([c]) for c, f in zip(char_path, char_frames)
                 if lo < f <= hi]
        repl = "".join(chars).replace(" ", "")
        out.append(repl if repl else w)
    return " ".join(out)


def eval_word(session, loader, save_dir=None, progress=False,
              resolving_unk: bool = False, sub1_loader=None):
    """Word-level WER; ``resolving_unk=True`` recovers <unk> words from the
    char-level sub1 CTC head aligned by attention peaks (reference
    resolving_unk.py). ``sub1_loader`` supplies idx2token for the char unit
    (defaults to the main loader's)."""
    if not resolving_unk:
        return eval_unit(session, loader, "word", save_dir, progress)
    import numpy as np
    import jax.numpy as jnp
    from .edit_distance import compute_wer
    idx2word = loader.idx2token
    idx2char = (sub1_loader or loader).dataset.idx2token_sub1 \
        if getattr((sub1_loader or loader).dataset, "idx2token_sub1", None) \
        else (sub1_loader.idx2token if sub1_loader else None)
    assert idx2char is not None, \
        "resolving_unk needs a char-level converter (dict_sub1 or sub1_loader)"
    assert session.model.ctc_sub1 is not None, \
        "resolving_unk needs a char-level CTC sub1 head"
    n_err = n_tok = 0
    n_utts = 0
    factor = getattr(session.model.encoder, "subsampling_factor", 1)
    for batch in loader:
        eouts_all = session.encode(batch["xs"], batch["xlens"])
        session._ens_eouts = []
        key = "ys_sub1" if "ys_sub1" in eouts_all else "ys"
        lp_sub = np.asarray(session.model.apply(
            {"params": session.params}, eouts_all[key]["xs"],
            method=lambda m, e: m.ctc_sub1.log_probs(e)))
        el_sub = np.asarray(eouts_all[key]["xlens"])
        for b in range(len(batch["utt_ids"])):
            session._b_idx = b
            e = eouts_all["ys"]["xs"][b:b + 1]
            el = eouts_all["ys"]["xlens"][b:b + 1]
            best, _ = session._beam_one_las(e, el)
            peaks = getattr(session, "_last_nbest_peaks", [[]])[0]
            # char CTC best path with first-emission frames
            path = np.argmax(lp_sub[b][: el_sub[b]], -1)
            char_path, char_frames = [], []
            prev = 0
            for f, c in enumerate(path):
                if c != 0 and c != prev:
                    char_path.append(int(c))
                    char_frames.append(f)
                prev = c
            hyp_text = resolve_unk_text(best, peaks, idx2word,
                                        char_path, char_frames, idx2char)
            ref = batch["text"][b].split()
            _, s, i, d = compute_wer(ref, hyp_text.split())
            n_err += s + i + d
            n_tok += len(ref)
            n_utts += 1
    return {"wer": 100.0 * n_err / max(n_tok, 1), "n_utts": n_utts}


def eval_phone(session, loader, save_dir=None, progress=False):
    return eval_unit(session, loader, "phone", save_dir, progress)
