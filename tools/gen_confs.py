"""Generate the full per-corpus conf tree from the reference recipes via
neural_sp_tpu.utils.convert_config (the drop-in migration converter).

Mirrors examples/<corpus>/conf/<subpath>; the kaldi-style recipe level
(s5, s5c, s5b, s5_r2) is flattened away; tedlium s5_r3 -> tedlium3.
Existing files are left untouched (hand-transcribed confs win).
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neural_sp_tpu.utils.convert_config import convert_file

REF = "/root/reference/examples"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

CORPUS_TITLE = {
    "aishell": "AISHELL-1", "aishell2": "AISHELL-2", "ami": "AMI",
    "ci_test": "CI test corpus", "csj": "CSJ", "laborotv": "LaboroTVSpeech",
    "language_model": "LM corpora", "librispeech": "LibriSpeech",
    "swbd": "Switchboard", "tedlium": "TEDLIUM2", "tedlium3": "TEDLIUM3",
    "timit": "TIMIT", "wsj": "WSJ",
}


def out_path(ref_yaml: str) -> str:
    rel = os.path.relpath(ref_yaml, REF)
    parts = rel.split(os.sep)
    corpus = parts[0]
    rest = parts[1:]
    # flatten the kaldi recipe dir (s5, s5c, s5b, s5_r2, s5_r3)
    if rest and rest[0].startswith("s5"):
        if corpus == "tedlium" and rest[0] == "s5_r3":
            corpus = "tedlium3"
        rest = rest[1:]
    return os.path.join(OUT, corpus, *rest), corpus


def main():
    made, skipped = 0, 0
    for ref_yaml in sorted(glob.glob(f"{REF}/**/*.yaml", recursive=True)):
        dst, corpus = out_path(ref_yaml)
        if os.path.exists(dst):
            skipped += 1
            continue
        name = os.path.splitext(os.path.basename(ref_yaml))[0]
        header = f"{CORPUS_TITLE.get(corpus, corpus)} {name}"
        convert_file(ref_yaml, dst, header=header)
        made += 1
    print(f"generated {made} confs ({skipped} existing kept)")


if __name__ == "__main__":
    main()
