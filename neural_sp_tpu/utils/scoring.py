"""Host-side scoring/prep utilities (reference ``utils/`` CLIs).

Covers the four small text tools the recipes call between decode and
sclite-style scoring, plus the TIMIT phone-class reduction:

- ``map2phone``       — reference ``utils/map2phone.py``: map word
  transcripts to phone sequences with a pronunciation lexicon (used by the
  CSJ/Librispeech/TEDLIUM recipes to build phone-unit training targets).
- ``trn2ctm``         — reference ``utils/trn2ctm.py``: convert a trn
  hypothesis file to a NIST ctm file, uniformly spreading word times over
  the utterance window (Switchboard stm end-time fixup supported).
- ``concat_ref``      — reference ``utils/concat_ref.py``: concatenate
  per-utterance references into one line per speaker (longform eval).
- ``compute_oov_rate``— reference ``utils/compute_oov_rate.py``.
- ``timit_norm_trans``— reference ``examples/timit/s5/local/
  timit_norm_trans.pl`` + ``conf/phones.60-48-39.map``: reduce TIMIT's 61
  training phones to the standard 48 or 39 scoring classes (glottal stop
  ``q`` is deleted), applied to ref+hyp before PER like
  ``examples/timit/s5/score.sh``.

All pure host text processing — CLI via
``python -m neural_sp_tpu.utils.scoring <subcommand> ...``.
"""
from __future__ import annotations

import argparse
import codecs
import re
import sys

# The standard TIMIT phone-class reduction (Lee & Hon 1989), as shipped in
# Kaldi/the reference as conf/phones.60-48-39.map: {p61: (p48, p39)}.
# 'q' maps to deletion at both levels.
TIMIT_PHONE_MAP: dict[str, tuple[str, str]] = {
    "aa": ("aa", "aa"), "ae": ("ae", "ae"), "ah": ("ah", "ah"),
    "ao": ("ao", "aa"), "aw": ("aw", "aw"), "ax": ("ax", "ah"),
    "ax-h": ("ax", "ah"), "axr": ("er", "er"), "ay": ("ay", "ay"),
    "b": ("b", "b"), "bcl": ("vcl", "sil"), "ch": ("ch", "ch"),
    "d": ("d", "d"), "dcl": ("vcl", "sil"), "dh": ("dh", "dh"),
    "dx": ("dx", "dx"), "eh": ("eh", "eh"), "el": ("el", "l"),
    "em": ("m", "m"), "en": ("en", "n"), "eng": ("ng", "ng"),
    "epi": ("epi", "sil"), "er": ("er", "er"), "ey": ("ey", "ey"),
    "f": ("f", "f"), "g": ("g", "g"), "gcl": ("vcl", "sil"),
    "h#": ("sil", "sil"), "hh": ("hh", "hh"), "hv": ("hh", "hh"),
    "ih": ("ih", "ih"), "ix": ("ix", "ih"), "iy": ("iy", "iy"),
    "jh": ("jh", "jh"), "k": ("k", "k"), "kcl": ("cl", "sil"),
    "l": ("l", "l"), "m": ("m", "m"), "n": ("n", "n"),
    "ng": ("ng", "ng"), "nx": ("n", "n"), "ow": ("ow", "ow"),
    "oy": ("oy", "oy"), "p": ("p", "p"), "pau": ("sil", "sil"),
    "pcl": ("cl", "sil"), "r": ("r", "r"), "s": ("s", "s"),
    "sh": ("sh", "sh"), "t": ("t", "t"), "tcl": ("cl", "sil"),
    "th": ("th", "th"), "uh": ("uh", "uh"), "uw": ("uw", "uw"),
    "ux": ("uw", "uw"), "v": ("v", "v"), "w": ("w", "w"),
    "y": ("y", "y"), "z": ("z", "z"), "zh": ("zh", "sh"),
}


def timit_norm_trans(tokens: list[str], to: int = 39,
                     from_: int = 61) -> list[str]:
    """Map a phone-token sequence between TIMIT phone sets.

    ``from_`` is 61 (training set) or 48; ``to`` is 48 or 39. The glottal
    stop ``q`` (and, from 61, anything unknown) is deleted, matching
    timit_norm_trans.pl; tokens already in the target set pass through when
    mapping from 48.
    """
    if to not in (48, 39) or from_ not in (61, 48):
        raise ValueError("TIMIT maps are 61->{48,39} and 48->39")
    col = 0 if to == 48 else 1
    if from_ == 61:
        table = {p: cols[col] for p, cols in TIMIT_PHONE_MAP.items()}
    else:
        table = {cols[0]: cols[1] for cols in TIMIT_PHONE_MAP.values()}
    return [table[t] for t in tokens if t in table]


def load_lexicon(path: str) -> tuple[dict[str, str], int]:
    """word -> 'p1 p2 ...' (first pronunciation wins is NOT applied: the
    reference keeps the LAST line per word — dict overwrite — mirrored
    here). Returns (lexicon, max word length in chars)."""
    word2phone: dict[str, str] = {}
    max_n_char = 0
    with codecs.open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(" ")
            word = parts[0].split("+")[0].lower()  # CSJ '+pos', LS upper
            word2phone[word] = " ".join(parts[1:])
            max_n_char = max(max_n_char, len(word))
    return word2phone, max_n_char


def map2phone_lines(text_lines, word2phone: dict[str, str],
                    max_n_char: int = 0, unk: str = "NSN",
                    word_segmentation: bool = True):
    """Yield 'utt_id phone...' lines for 'utt_id word...' input lines.

    word_segmentation=False does greedy longest-match over characters
    (Chinese); unknown words map to ``unk``.
    """
    for line in text_lines:
        line = re.sub(r"[\s]+", " ", line.strip())
        parts = [p for p in line.split(" ") if p]
        utt_id, words = parts[0], parts[1:]
        phones: list[str] = []
        if word_segmentation:
            for w in words:
                phones += word2phone.get(w, unk).split()
        else:
            assert len(words) == 1
            chars = list(words[0])
            i = 0
            while i < len(chars):
                for n in range(max_n_char, 0, -1):
                    cand = "".join(chars[i:i + n])
                    if cand in word2phone:
                        phones += word2phone[cand].split()
                        i += n
                        break
                else:
                    i += 1  # unmatchable char: skip (reference loops forever)
        yield f"{utt_id} {' '.join(phones)}"


def parse_stm_segments(stm_lines) -> dict[str, dict[float, float]]:
    """speaker -> {start_t: end_t} from an stm file (';' comments)."""
    segs: dict[str, dict[float, float]] = {}
    for line in stm_lines:
        line = line.strip()
        if not line or line[0] == ";":
            continue
        f = line.split()
        segs.setdefault(f[2], {})[float(f[3])] = float(f[4])
    return segs


def trn2ctm_lines(trn_lines, stm_segments=None):
    """Yield ctm lines for trn lines 'w1 w2 ... (speaker-uttid)'.

    utt ids must end in '<start_frame>_<end_frame>' (10 ms frames); word
    times are spread uniformly across the utterance. With stm segments the
    end time is looked up from the stm (Switchboard), channel = the A/B
    suffix of the speaker tag; else channel '1'.
    """
    for line in trn_lines:
        line = line.strip()
        if not line:
            continue
        words = line.split()[:-1]
        spk_utt = line.split()[-1].replace("(", "").replace(")", "")
        speaker = spk_utt.split("-")[0]
        utt_id = "-".join(spk_utt.split("-")[1:]).replace("-", "_")
        channel = speaker.split("-")[0].split("_")[-1] if stm_segments \
            else "1"
        start_f, end_f = utt_id.split("_")[-2], utt_id.split("_")[-1]
        start_t = round(int(start_f) / 100, 2)
        if stm_segments:
            seg = stm_segments[speaker]
            end_t = seg.get(start_t, seg.get(round(start_t + 0.01, 2)))
        else:
            end_t = round(int(end_f) / 100, 2)
        dur = end_t - start_t
        if words:
            dur /= len(words)
        spk_no_ch = speaker.replace("_A", "").replace("_B", "")
        for w in words:
            yield (f"{spk_no_ch} {channel} {start_t:.2f} {dur:.2f} {w} "
                   f"{1:.3f}")
            start_t += dur


def concat_ref_lines(text_lines, utt2spk: dict[str, str]):
    """Concatenate per-utterance texts into one '<eos>'-joined line per
    speaker, in first-appearance order."""
    refs: dict[str, str] = {}
    for line in text_lines:
        parts = line.strip().split()
        if not parts:
            continue
        spk = utt2spk[parts[0]]
        text = " ".join(p for p in parts[1:] if p)
        refs[spk] = text if spk not in refs else refs[spk] + " <eos> " + text
    for k, v in refs.items():
        yield f"{k} {v}"


def compute_oov_rate(word_count_lines, vocab: set[str]) -> tuple[float, int,
                                                                 int]:
    """Returns (oov %, n_oovs, n_words) from 'count word' lines."""
    n_oovs = n_words = 0
    for line in word_count_lines:
        parts = line.strip().split(" ")
        if len(parts) != 2:
            continue
        count, w = parts
        if w == "(%hesitation)":  # swbd scoring convention
            continue
        n_words += int(count)
        if w not in vocab:
            n_oovs += int(count)
    return 100.0 * n_oovs / max(n_words, 1), n_oovs, n_words


def _read(path):
    return codecs.open(path, "r", encoding="utf-8")


def main(argv=None):
    p = argparse.ArgumentParser(prog="neural_sp_tpu.utils.scoring")
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("map2phone")
    m.add_argument("--text", required=True)
    m.add_argument("--lexicon", required=True)
    m.add_argument("--unk", default="NSN", nargs="?")
    m.add_argument("--word_segmentation", type=int, default=1)

    t = sub.add_parser("trn2ctm")
    t.add_argument("trn")
    t.add_argument("--stm", default="", nargs="?")

    c = sub.add_parser("concat_ref")
    c.add_argument("text")
    c.add_argument("utt2spk")

    o = sub.add_parser("compute_oov_rate")
    o.add_argument("word_count")
    o.add_argument("dict")
    o.add_argument("set")

    n = sub.add_parser("timit_norm_trans")
    n.add_argument("-i", dest="input", required=True, help="trn or text file")
    n.add_argument("--from", dest="from_", type=int, default=61)
    n.add_argument("--to", type=int, default=39)
    n.add_argument("--trn", type=int, default=1,
                   help="1: lines end in '(spk-utt)' tags (kept verbatim)")

    a = p.parse_args(argv)
    if a.cmd == "map2phone":
        lex, max_n = load_lexicon(a.lexicon)
        with _read(a.text) as f:
            for line in map2phone_lines(f, lex, max_n, a.unk,
                                        bool(a.word_segmentation)):
                print(line)
    elif a.cmd == "trn2ctm":
        segs = None
        if a.stm:
            with _read(a.stm) as f:
                segs = parse_stm_segments(f)
        with _read(a.trn) as f:
            for line in trn2ctm_lines(f, segs):
                print(line)
    elif a.cmd == "concat_ref":
        utt2spk = {}
        with _read(a.utt2spk) as f:
            for line in f:
                u, s = line.strip().split()
                utt2spk[u] = s.split("-")[0]  # TEDLIUM2 spk-session
        with _read(a.text) as f:
            for line in concat_ref_lines(f, utt2spk):
                print(line)
    elif a.cmd == "compute_oov_rate":
        with _read(a.dict) as f:
            vocab = {line.strip().split(" ")[0] for line in f if line.strip()}
        with _read(a.word_count) as f:
            rate, _, _ = compute_oov_rate(f, vocab)
        print("%s: %.3f%%" % (a.set, rate))
    elif a.cmd == "timit_norm_trans":
        with _read(a.input) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if a.trn:
                    toks, tag = line.split()[:-1], line.split()[-1]
                    mapped = timit_norm_trans(toks, a.to, a.from_)
                    print(" ".join(mapped + [tag]))
                else:
                    parts = line.split()
                    mapped = timit_norm_trans(parts[1:], a.to, a.from_)
                    print(" ".join([parts[0]] + mapped))


if __name__ == "__main__":
    main(sys.argv[1:])
