#!/usr/bin/env bash
# Librispeech recipe (reference examples/librispeech/s5/run.sh analog).
# Stages: 0 data prep -> 1 features+TSV -> 2 vocab -> 3 LM -> 4 ASR -> 5 decode.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-5}
data=${DATA:-./data}
exp=${EXP:-./exp}
conf=${CONF:-conf/asr/conformer_kernel15_clamp10_hie_subsample8_las_ln_large.yaml}
lm_conf=${LM_CONF:-conf/lm/rnnlm.yaml}
wp_vocab_size=${WP_VOCAB:-10000}
# flagship "+sp": 3-way speed perturbation of the train split
# (reference run.sh:138-147 + utils/speed_perturb_3way.sh)
speed_perturb=${SPEED_PERTURB:-0.9_1.0_1.1}

# Stage 0: download + manifest prep (reference run.sh:86-124). FLAC inputs
# decode through the native C++ decoder (native/nsp_flac.cc) — no sox.
# Skipped automatically when $data/<split>/wav.scp already exists or the
# host has no network.
lm_sets=${TRAIN_SETS:-"train-clean-100 train-clean-360 train-other-500"}
dev_sets=${DEV_SETS:-"dev-clean dev-other"}
test_sets=${TEST_SETS:-"test-clean test-other"}
db=${DB:-$data/db}
if [ $stage -le 0 ] && [ $stop_stage -ge 0 ] && [ ! -f "$data/train/wav.scp" ]; then
  mkdir -p "$db"
  for part in $lm_sets $dev_sets $test_sets; do
    if [ ! -d "$db/LibriSpeech/$part" ]; then
      echo "downloading $part ..."
      wget -q -c -O "$db/$part.tar.gz" \
        "https://www.openslr.org/resources/12/$part.tar.gz" \
        || { echo "download failed (offline?); provide wav.scp/text manually"; break; }
      tar -xzf "$db/$part.tar.gz" -C "$db"
    fi
  done
  DB="$db" TRAIN_SETS="$lm_sets" DEV_SETS="$dev_sets" \
    TEST_SETS="$test_sets" python - <<'EOF'
# build wav.scp (flac paths) + text from the LibriSpeech layout:
# <split>/<spk>/<chap>/<spk>-<chap>-<utt>.flac + <spk>-<chap>.trans.txt
import os, glob
db = os.environ["DB"]
data = os.environ.get("DATA", "./data")
groups = {"train": os.environ["TRAIN_SETS"].split(),
          "dev": os.environ["DEV_SETS"].split(),
          "test": os.environ["TEST_SETS"].split()}
for split, parts in groups.items():
    scp, txt = [], []
    for part in parts:
        root = os.path.join(db, "LibriSpeech", part)
        if not os.path.isdir(root):
            continue
        for trans in glob.glob(os.path.join(root, "*", "*",
                                            "*.trans.txt")):
            chap_dir = os.path.dirname(trans)
            for line in open(trans):
                utt, text = line.strip().split(" ", 1)
                flac = os.path.join(chap_dir, utt + ".flac")
                if os.path.isfile(flac):
                    scp.append(f"{utt} {flac}")
                    txt.append(f"{utt} {text.lower()}")
    if scp:
        os.makedirs(os.path.join(data, split), exist_ok=True)
        open(os.path.join(data, split, "wav.scp"), "w").write(
            "\n".join(scp) + "\n")
        open(os.path.join(data, split, "text"), "w").write(
            "\n".join(txt) + "\n")
        print(f"{split}: {len(scp)} utts")
EOF
fi

# Stage 1/2: feature extraction + vocab + TSVs.
# Host-side prep uses neural_sp_tpu.utils.make_dataset (fbank+CMVN+BPE in
# pure Python/JAX — no Kaldi). Provide wav.scp + text per split under
# $data/<split>/ then:
if [ $stage -le 2 ] && [ $stop_stage -ge 0 ]; then
  SPEED_PERTURB="$speed_perturb" python - <<'EOF'
import os, sys
from neural_sp_tpu.utils.make_dataset import (
    extract_features, make_vocab, make_tsv, expand_utts_for_speed)
data = os.environ.get("DATA", "./data")
wp = int(os.environ.get("WP_VOCAB", 10000))
sp = tuple(float(f) for f in
           os.environ.get("SPEED_PERTURB", "").split("_") if f)
cmvn = None
texts = []
for split in ("train", "dev", "test"):
    d = os.path.join(data, split)
    if not os.path.isdir(d):
        print(f"skip {split} (no {d})"); continue
    wav_scp = dict(l.split(None, 1) for l in open(f"{d}/wav.scp")
                   .read().strip().splitlines())
    text = dict(l.split(None, 1) for l in open(f"{d}/text")
                .read().strip().splitlines())
    if split == "train":
        texts = list(text.values())
        make_vocab(texts, "wp", f"{data}/dict_wp.txt", wp,
                   wp_model_path=f"{data}/wp.json")
    is_train = split == "train"
    paths, lens, cmvn = extract_features(
        wav_scp, f"{d}/feat", cmvn=None if is_train else cmvn,
        speed_perturbs=sp if is_train else ())
    utts = [{"utt_id": u, "speaker": u.split("-")[0], "text": t}
            for u, t in text.items()]
    if is_train and sp:
        utts = expand_utts_for_speed(utts, sp)
    make_tsv(utts, paths, lens, f"{data}/dict_wp.txt", "wp",
             f"{data}/{split}_wp.tsv", wp_model=f"{data}/wp.json")
EOF
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python -m neural_sp_tpu.bin.lm.train --config "$lm_conf" \
    --train_set "$data/train_wp.tsv" --dev_set "$data/dev_wp.tsv" \
    --dict "$data/dict_wp.txt" --wp_model "$data/wp.json" \
    --model_save_dir "$exp/lm"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  python -m neural_sp_tpu.bin.asr.train --config "$conf" \
    --train_set "$data/train_wp.tsv" --dev_set "$data/dev_wp.tsv" \
    --dict "$data/dict_wp.txt" --wp_model "$data/wp.json" \
    --model_save_dir "$exp/asr"
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  python -m neural_sp_tpu.bin.asr.eval \
    --recog_model "$exp/asr" --recog_sets "$data/test_wp.tsv" \
    --recog_beam_width 10 --recog_ctc_weight 0.3 --recog_length_norm true \
    --recog_lm "$exp/lm" --recog_lm_weight 0.5 --recog_n_average 10 \
    --recog_dir "$exp/decode"
fi
