"""Word <-> id converters + char-level OOV resolution helpers (reference
``neural_sp/datasets/token_converter/word.py:9-52`` and
``Char2word``/``Word2char``)."""
from __future__ import annotations

from .character import load_dict


class Word2idx:
    def __init__(self, dict_path: str, word_char_mix: bool = False):
        self.token2idx = load_dict(dict_path)
        self.word_char_mix = word_char_mix

    def __call__(self, text: str) -> list[int]:
        ids = []
        for w in text.split(" "):
            if not w:
                continue
            if w in self.token2idx:
                ids.append(self.token2idx[w])
            elif self.word_char_mix:
                for c in list(w):
                    ids.append(self.token2idx.get(c, self.token2idx["<unk>"]))
            else:
                ids.append(self.token2idx["<unk>"])
        return ids


class Idx2word:
    def __init__(self, dict_path: str):
        self.idx2token = {v: k for k, v in load_dict(dict_path).items()}

    def __call__(self, ids, return_list: bool = False):
        toks = [self.idx2token.get(int(i), "<unk>") for i in ids]
        if return_list:
            return toks
        return " ".join(toks)


class Char2word:
    """Map char-level id sequences to word ids (OOV resolution aid)."""

    def __init__(self, word_dict_path: str, char_dict_path: str):
        self.w_t2i = load_dict(word_dict_path)
        self.c_i2t = {v: k for k, v in load_dict(char_dict_path).items()}

    def __call__(self, char_ids) -> int:
        word = "".join(self.c_i2t.get(int(i), "") for i in char_ids)
        return self.w_t2i.get(word, self.w_t2i["<unk>"])


class Word2char:
    def __init__(self, word_dict_path: str, char_dict_path: str):
        self.w_i2t = {v: k for k, v in load_dict(word_dict_path).items()}
        self.c_t2i = load_dict(char_dict_path)

    def __call__(self, word_id: int) -> list[int]:
        word = self.w_i2t.get(int(word_id), "<unk>")
        return [self.c_t2i.get(c, self.c_t2i["<unk>"]) for c in list(word)]
