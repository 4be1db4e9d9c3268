"""Native SentencePiece ``.model`` reader — no external dependency.

The reference tokenizes with the SentencePiece C++ library
(``neural_sp/datasets/token_converter/wordpiece.py:28-29`` loads a trained
``.model``); recipes ship those models, so drop-in parity requires reading
them unchanged. This module parses the ModelProto wire format directly
(protobuf is just varints + length-delimited blobs) and implements both
inference algorithms:

  * **unigram** (spm default): Viterbi segmentation maximizing the sum of
    piece log-probs, unknown characters scored ``min_score - 10`` (the
    sentencepiece ``kUnkPenalty`` convention);
  * **bpe**: iterative merge of the adjacent pair whose concatenation is
    in-vocab with the highest score (scores encode merge rank), leftmost
    tie-break — the sentencepiece BPE decoding order.

Normalization: NFKC + whitespace collapse + dummy-prefix + "▁" word marker
(the ``nmt_nfkc`` default). Precompiled charsmaps are not interpreted —
for ASR text (lowercase ASCII/CJK transcripts) NFKC is the identity part
that matters.

Also provides :func:`write_spm_model` so tests can build tiny fixtures
without the C++ trainer.
"""
from __future__ import annotations

import struct
import unicodedata

WORD_BOUNDARY = "▁"  # ▁

# ModelProto field numbers (sentencepiece_model.proto)
_F_PIECES = 1
_F_TRAINER_SPEC = 2
# SentencePiece sub-message
_F_PIECE = 1
_F_SCORE = 2
_F_TYPE = 3
# TrainerSpec
_F_MODEL_TYPE = 3

# SentencePiece.Type enum
TYPE_NORMAL = 1
TYPE_UNKNOWN = 2
TYPE_CONTROL = 3
TYPE_USER_DEFINED = 4
TYPE_UNUSED = 5
TYPE_BYTE = 6

_MODEL_TYPES = {1: "unigram", 2: "bpe", 3: "word", 4: "char"}


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a serialized message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:          # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:        # 64-bit
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:        # length-delimited
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:        # 32-bit
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield field, wt, v


def parse_spm_model(path: str):
    """-> (pieces: list[(piece, score, type)], model_type: str)."""
    with open(path, "rb") as f:
        buf = f.read()
    pieces = []
    model_type = "unigram"
    for field, wt, v in _iter_fields(buf):
        if field == _F_PIECES and wt == 2:
            piece, score, ptype = "", 0.0, TYPE_NORMAL
            for f2, wt2, v2 in _iter_fields(v):
                if f2 == _F_PIECE and wt2 == 2:
                    piece = v2.decode("utf-8")
                elif f2 == _F_SCORE and wt2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == _F_TYPE and wt2 == 0:
                    ptype = v2
            pieces.append((piece, score, ptype))
        elif field == _F_TRAINER_SPEC and wt == 2:
            for f2, wt2, v2 in _iter_fields(v):
                if f2 == _F_MODEL_TYPE and wt2 == 0:
                    model_type = _MODEL_TYPES.get(v2, "unigram")
    if not pieces:
        raise ValueError(f"{path}: no pieces found — not a SentencePiece "
                         "model file?")
    return pieces, model_type


def _write_varint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_field(out: bytearray, field: int, wt: int, payload):
    _write_varint(out, (field << 3) | wt)
    if wt == 0:
        _write_varint(out, payload)
    elif wt == 2:
        _write_varint(out, len(payload))
        out.extend(payload)
    elif wt == 5:
        out.extend(payload)
    else:
        raise ValueError(wt)


def write_spm_model(pieces, path: str, model_type: str = "unigram"):
    """Serialize a minimal valid ModelProto (test fixtures / native export).

    pieces: iterable of (piece, score) or (piece, score, type).
    """
    inv = {v: k for k, v in _MODEL_TYPES.items()}
    out = bytearray()
    for p in pieces:
        piece, score = p[0], p[1]
        ptype = p[2] if len(p) > 2 else TYPE_NORMAL
        sub = bytearray()
        _write_field(sub, _F_PIECE, 2, piece.encode("utf-8"))
        _write_field(sub, _F_SCORE, 5, struct.pack("<f", float(score)))
        if ptype != TYPE_NORMAL:
            _write_field(sub, _F_TYPE, 0, ptype)
        _write_field(out, _F_PIECES, 2, bytes(sub))
    spec = bytearray()
    _write_field(spec, _F_MODEL_TYPE, 0, inv[model_type])
    _write_field(out, _F_TRAINER_SPEC, 2, bytes(spec))
    with open(path, "wb") as f:
        f.write(bytes(out))


class SentencePieceModel:
    """Encode/decode with a parsed ``.model`` — mirrors the subset of the
    ``SentencePieceProcessor`` API the converters use."""

    def __init__(self, path: str):
        self.pieces, self.model_type = parse_spm_model(path)
        self.piece2id = {}
        self.unk_id = 0
        for i, (p, _, t) in enumerate(self.pieces):
            if p not in self.piece2id:
                self.piece2id[p] = i
            if t == TYPE_UNKNOWN:
                self.unk_id = i
        scores = [s for _, s, t in self.pieces
                  if t in (TYPE_NORMAL, TYPE_USER_DEFINED)]
        self._min_score = min(scores) if scores else 0.0
        self._unk_score = self._min_score - 10.0  # spm kUnkPenalty
        self._scoreable = {
            p: s for p, s, t in self.pieces
            if t in (TYPE_NORMAL, TYPE_USER_DEFINED, TYPE_BYTE)}
        self._max_piece_len = max(
            (len(p) for p in self._scoreable), default=1)

    # -- normalization ----------------------------------------------------
    @staticmethod
    def normalize(text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        text = " ".join(text.split())
        if not text:
            return ""
        return WORD_BOUNDARY + text.replace(" ", WORD_BOUNDARY)

    # -- encoding ---------------------------------------------------------
    def encode_as_pieces(self, text: str) -> list[str]:
        s = self.normalize(text)
        if not s:
            return []
        if self.model_type == "bpe":
            return self._encode_bpe(s)
        if self.model_type == "char":
            return list(s)
        if self.model_type == "word":
            return [WORD_BOUNDARY + w for w in
                    s.split(WORD_BOUNDARY) if w]
        return self._encode_unigram(s)

    def encode_as_ids(self, text: str) -> list[int]:
        return [self.piece2id.get(p, self.unk_id)
                for p in self.encode_as_pieces(text)]

    def _encode_unigram(self, s: str) -> list[str]:
        """Viterbi over substrings: best[i] = max score of s[:i]."""
        n = len(s)
        best = [0.0] + [float("-inf")] * n
        back: list[tuple[int, str] | None] = [None] * (n + 1)
        maxlen = self._max_piece_len
        for i in range(n):
            if best[i] == float("-inf"):
                continue
            # unknown single char fallback
            cand = best[i] + self._unk_score
            if cand > best[i + 1]:
                best[i + 1] = cand
                back[i + 1] = (i, s[i])
            for j in range(i + 1, min(i + maxlen, n) + 1):
                sc = self._scoreable.get(s[i:j])
                if sc is None:
                    continue
                cand = best[i] + sc
                if cand > best[j]:
                    best[j] = cand
                    back[j] = (i, s[i:j])
        out = []
        i = n
        while i > 0:
            prev, piece = back[i]
            out.append(piece)
            i = prev
        return out[::-1]

    def _encode_bpe(self, s: str) -> list[str]:
        syms = list(s)
        while len(syms) > 1:
            best_i, best_score = -1, float("-inf")
            for i in range(len(syms) - 1):
                sc = self._scoreable.get(syms[i] + syms[i + 1])
                if sc is not None and sc > best_score:
                    best_i, best_score = i, sc
            if best_i < 0:
                break
            syms = (syms[:best_i] + [syms[best_i] + syms[best_i + 1]]
                    + syms[best_i + 2:])
        return syms

    # -- decoding ---------------------------------------------------------
    def id_to_piece(self, idx: int) -> str:
        return self.pieces[idx][0]

    def decode_pieces(self, pieces) -> str:
        return "".join(pieces).replace(WORD_BOUNDARY, " ").strip()
