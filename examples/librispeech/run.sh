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

# Stage 0/1/2: download + feature extraction + vocab + TSVs.
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
