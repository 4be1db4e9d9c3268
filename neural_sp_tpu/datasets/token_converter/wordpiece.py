"""Wordpiece (subword) tokenization with a self-contained BPE implementation.

The reference shells out to SentencePiece (C++) for wordpiece training and
encode/decode (``neural_sp/datasets/token_converter/wordpiece.py:10-52``,
``tools/Makefile:149-155``). SentencePiece is host-side I/O, not model
compute, so this framework ships a dependency-free BPE trainer/encoder with
SentencePiece-compatible conventions:

  * "▁" (U+2581) marks word starts; decode joins pieces and maps "▁"->space;
  * model files are JSON (vocab + ordered merges), trainable from raw text;
  * real SentencePiece ``.model`` files (the artifacts shipped by reference
    recipes, loaded at ``wordpiece.py:28-29``) are read NATIVELY via
    :mod:`.spm_model` (protobuf wire parse + unigram Viterbi / BPE merge) —
    no ``sentencepiece`` package needed; if it IS importable it is
    preferred for exact parity with its normalizer charsmap.
"""
from __future__ import annotations

import codecs
import json
import os
from collections import Counter

WORD_BOUNDARY = "▁"  # ▁

_SPECIALS = ["<blank>", "<unk>", "<eos>", "<pad>"]


def train_bpe(
    sentences,
    vocab_size: int,
    model_path: str,
    character_coverage: float = 1.0,
) -> dict:
    """Train a BPE model over an iterable of sentences; write JSON model.

    Vocab layout: ids 0-3 specials, then single characters, then merged
    pieces in merge order (stable, deterministic).
    """
    word_freq: Counter = Counter()
    for s in sentences:
        for w in s.strip().split():
            word_freq[WORD_BOUNDARY + w] += 1

    char_freq: Counter = Counter()
    for w, f in word_freq.items():
        for c in w:
            char_freq[c] += f
    chars = [c for c, _ in char_freq.most_common()]
    if character_coverage < 1.0:
        keep = int(len(chars) * character_coverage)
        chars = chars[: max(keep, 1)]
    charset = set(chars)

    # word -> list of symbols (rare chars -> dropped to <unk> at encode time)
    words = {w: [c for c in w if c in charset] for w in word_freq}

    merges: list[tuple[str, str]] = []
    vocab = list(_SPECIALS) + sorted(charset)
    max_merges = max(vocab_size - len(vocab), 0)

    pair_freq: Counter = Counter()
    for w, syms in words.items():
        f = word_freq[w]
        for a, b in zip(syms, syms[1:]):
            pair_freq[(a, b)] += f

    for _ in range(max_merges):
        if not pair_freq:
            break
        # deterministic argmax: max freq, then lexicographic
        (a, b), best_f = max(
            pair_freq.items(), key=lambda kv: (kv[1], kv[0]))
        if best_f < 2:
            break
        merges.append((a, b))
        new_sym = a + b
        vocab.append(new_sym)
        for w, syms in words.items():
            if a not in syms:
                continue
            f = word_freq[w]
            i, out = 0, []
            changed = False
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new_sym)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                for x, y in zip(syms, syms[1:]):
                    pair_freq[(x, y)] -= f
                    if pair_freq[(x, y)] <= 0:
                        del pair_freq[(x, y)]
                for x, y in zip(out, out[1:]):
                    pair_freq[(x, y)] += f
                words[w] = out
        if len(vocab) >= vocab_size:
            break

    model = {
        "type": "bpe",
        "vocab": vocab,
        "merges": [[a, b] for a, b in merges],
    }
    os.makedirs(os.path.dirname(os.path.abspath(model_path)), exist_ok=True)
    with codecs.open(model_path, "w", "utf-8") as f:
        json.dump(model, f, ensure_ascii=False)
    return model


class BPEModel:
    def __init__(self, model_path: str):
        with codecs.open(model_path, "r", "utf-8") as f:
            model = json.load(f)
        self.vocab = model["vocab"]
        self.piece2id = {p: i for i, p in enumerate(self.vocab)}
        self.rank = {tuple(m): r for r, m in enumerate(model["merges"])}

    def encode_word(self, word: str) -> list[str]:
        syms = [c for c in WORD_BOUNDARY + word]
        syms = [s if s in self.piece2id else "<unk>" for s in syms]
        while len(syms) > 1:
            best, best_rank = None, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = self.rank.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms = syms[:best] + [syms[best] + syms[best + 1]] + syms[best + 2:]
        return syms

    def encode(self, text: str) -> list[str]:
        out = []
        for w in text.strip().split():
            out.extend(self.encode_word(w))
        return out

    def decode_pieces(self, pieces) -> str:
        return "".join(pieces).replace(WORD_BOUNDARY, " ").strip()


def _is_spm_model(path: str) -> bool:
    return path.endswith(".model") and not path.endswith(".json.model")


class _SpmPackageAdapter:
    """sentencepiece package behind the native-reader interface."""

    def __init__(self, wp_model: str):
        import sentencepiece as spm
        self._sp = spm.SentencePieceProcessor()
        self._sp.Load(wp_model)
        self.unk_id = self._sp.unk_id()
        self.piece2id = _LazyPiece2Id(self._sp)

    def encode_as_pieces(self, text: str):
        return self._sp.EncodeAsPieces(text)

    def id_to_piece(self, idx: int) -> str:
        return self._sp.IdToPiece(idx)


class _LazyPiece2Id:
    def __init__(self, sp):
        self._sp = sp

    def get(self, piece, default):
        i = self._sp.PieceToId(piece)
        return default if (i == self._sp.unk_id() and
                           piece != self._sp.IdToPiece(i)) else i


def _load_spm(wp_model: str):
    try:
        return _SpmPackageAdapter(wp_model)
    except ImportError:
        from .spm_model import SentencePieceModel
        return SentencePieceModel(wp_model)


class Wp2idx:
    """Text -> wordpiece ids, via native BPE JSON model or SentencePiece."""

    def __init__(self, dict_path: str | None, wp_model: str):
        self._spm = None
        self._bpe = None
        if _is_spm_model(wp_model):
            self._spm = _load_spm(wp_model)
        else:
            self._bpe = BPEModel(wp_model)
        # optional external dict remaps pieces -> ids (reference dict.txt)
        self.token2idx = None
        if dict_path:
            from .character import load_dict
            self.token2idx = load_dict(dict_path)

    def __call__(self, text: str) -> list[int]:
        if self._spm is not None:
            pieces = self._spm.encode_as_pieces(text)
        else:
            pieces = self._bpe.encode(text)
        if self.token2idx is not None:
            return [self.token2idx.get(p, self.token2idx["<unk>"])
                    for p in pieces]
        if self._spm is not None:
            return [self._spm.piece2id.get(p, self._spm.unk_id)
                    for p in pieces]
        return [self._bpe.piece2id.get(p, 1) for p in pieces]


class Idx2wp:
    def __init__(self, dict_path: str | None, wp_model: str):
        self._spm = None
        if _is_spm_model(wp_model):
            self._spm = _load_spm(wp_model)
            self.idx2token = None
        else:
            self._bpe = BPEModel(wp_model)
            self.idx2token = {i: p for i, p in enumerate(self._bpe.vocab)}
        if dict_path:
            from .character import load_dict
            self.idx2token = {v: k for k, v in load_dict(dict_path).items()}

    def __call__(self, ids, return_list: bool = False):
        if self.idx2token is not None:
            pieces = [self.idx2token.get(int(i), "<unk>") for i in ids]
        else:
            pieces = [self._spm.id_to_piece(int(i)) for i in ids]
        if return_list:
            return pieces
        return "".join(pieces).replace(WORD_BOUNDARY, " ").strip()
