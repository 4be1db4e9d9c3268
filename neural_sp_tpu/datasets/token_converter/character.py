"""Character <-> id converters (reference
``neural_sp/datasets/token_converter/character.py:10-64``).

Dictionary file format (parity with reference dict.txt): one token per line,
``<token> <id>``. Ids 0-3 are reserved (blank/unk/eos/pad).
"""
from __future__ import annotations

import codecs


def load_dict(dict_path: str) -> dict[str, int]:
    token2idx = {"<blank>": 0, "<unk>": 1, "<eos>": 2, "<pad>": 3}
    with codecs.open(dict_path, "r", "utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            tok, idx = line.rstrip("\n").split(" ")
            token2idx[tok] = int(idx)
    return token2idx


class Char2idx:
    def __init__(self, dict_path: str, nlsyms: list[str] | None = None,
                 remove_space: bool = False):
        self.token2idx = load_dict(dict_path)
        self.nlsyms = nlsyms or []
        self.remove_space = remove_space

    def __call__(self, text: str) -> list[int]:
        ids = []
        words = text.split(" ")
        for i, w in enumerate(words):
            if w in self.nlsyms:
                ids.append(self.token2idx.get(w, self.token2idx["<unk>"]))
            else:
                for c in list(w):
                    ids.append(self.token2idx.get(c, self.token2idx["<unk>"]))
            if i < len(words) - 1 and not self.remove_space:
                ids.append(self.token2idx.get("<space>", self.token2idx["<unk>"]))
        return ids


class Idx2char:
    def __init__(self, dict_path: str):
        t2i = load_dict(dict_path)
        self.idx2token = {v: k for k, v in t2i.items()}

    def __call__(self, ids, return_list: bool = False):
        toks = [self.idx2token.get(int(i), "<unk>") for i in ids]
        if return_list:
            return toks
        return "".join(toks).replace("<space>", " ")
