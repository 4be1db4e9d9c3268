"""Phone <-> id converters (reference
``neural_sp/datasets/token_converter/phone.py``). Text is a space-separated
phone string."""
from __future__ import annotations

from .character import load_dict


class Phone2idx:
    def __init__(self, dict_path: str):
        self.token2idx = load_dict(dict_path)

    def __call__(self, text: str) -> list[int]:
        return [self.token2idx.get(p, self.token2idx["<unk>"])
                for p in text.split(" ") if p]


class Idx2phone:
    def __init__(self, dict_path: str):
        self.idx2token = {v: k for k, v in load_dict(dict_path).items()}

    def __call__(self, ids, return_list: bool = False):
        toks = [self.idx2token.get(int(i), "<unk>") for i in ids]
        if return_list:
            return toks
        return " ".join(toks)
