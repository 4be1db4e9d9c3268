#!/usr/bin/env bash
# Shared ASR recipe driver (reference examples/<corpus>/s5/run.sh stage
# structure): 0-2 data prep / features / vocab+TSV -> 3 LM -> 4 ASR ->
# 5 decode. Corpus wrappers set CONF / UNIT / WP_VOCAB and call this.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-5}
data=${DATA:-./data}
exp=${EXP:-./exp}
conf=${CONF:?set CONF to the ASR yaml}
lm_conf=${LM_CONF:-}
unit=${UNIT:-wp}
wp_vocab_size=${WP_VOCAB:-10000}
# 3-way speed perturbation of the train split (reference
# speed_perturb_3way.sh); set SPEED_PERTURB="" to disable
speed_perturb=${SPEED_PERTURB:-}
recog_flags=${RECOG_FLAGS:-"--recog_beam_width 10 --recog_ctc_weight 0.3 --recog_length_norm true"}

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 0 ]; then
  # expects $data/<split>/{wav.scp,text}; writes feats, dict, TSVs
  UNIT="$unit" WP_VOCAB="$wp_vocab_size" SPEED_PERTURB="$speed_perturb" \
    python - <<'PYEOF'
import os
from neural_sp_tpu.utils.make_dataset import (
    extract_features, make_vocab, make_tsv, expand_utts_for_speed)
data = os.environ.get("DATA", "./data")
unit = os.environ.get("UNIT", "wp")
wp = int(os.environ.get("WP_VOCAB", 10000))
sp = tuple(float(f) for f in
           os.environ.get("SPEED_PERTURB", "").split("_") if f)
cmvn = None
splits = [s for s in sorted(os.listdir(data))
          if os.path.isfile(os.path.join(data, s, "wav.scp"))]
# train FIRST: it builds the dict/wp model and the global CMVN that the
# other splits reuse
splits.sort(key=lambda s: (not s.startswith("train"), s))
wp_model = f"{data}/wp.json" if unit == "wp" else None
for split in splits:
    d = os.path.join(data, split)
    wav_scp = dict(l.split(None, 1) for l in open(f"{d}/wav.scp")
                   .read().strip().splitlines())
    text = dict(l.split(None, 1) for l in open(f"{d}/text")
                .read().strip().splitlines())
    if split.startswith("train"):
        make_vocab(list(text.values()), unit, f"{data}/dict_{unit}.txt",
                   wp, wp_model_path=wp_model)
    is_train = split.startswith("train")
    paths, lens, cmvn = extract_features(
        wav_scp, f"{d}/feat", cmvn=None if is_train else cmvn,
        speed_perturbs=sp if is_train else ())
    utts = [{"utt_id": u, "speaker": u.split("-")[0], "text": t}
            for u, t in text.items()]
    if is_train and sp:
        utts = expand_utts_for_speed(utts, sp)
    make_tsv(utts, paths, lens, f"{data}/dict_{unit}.txt", unit,
             f"{data}/{split}_{unit}.tsv", wp_model=wp_model)
PYEOF
fi

wp_args=""
if [ "$unit" = "wp" ]; then wp_args="--wp_model $data/wp.json"; fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ] && [ -n "$lm_conf" ]; then
  python -m neural_sp_tpu.bin.lm.train --config "$lm_conf" \
    --train_set "$data/train_${unit}.tsv" --dev_set "$data/dev_${unit}.tsv" \
    --dict "$data/dict_${unit}.txt" $wp_args \
    --model_save_dir "$exp/lm"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  python -m neural_sp_tpu.bin.asr.train --config "$conf" \
    --train_set "$data/train_${unit}.tsv" --dev_set "$data/dev_${unit}.tsv" \
    --dict "$data/dict_${unit}.txt" $wp_args \
    --model_save_dir "$exp/asr"
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  lm_args=""
  if [ -n "$lm_conf" ] && [ -d "$exp/lm" ]; then
    lm_args="--recog_lm $exp/lm --recog_lm_weight 0.5"
  fi
  for t in "$data"/test*_${unit}.tsv "$data"/eval*_${unit}.tsv \
           "$data"/dev*_${unit}.tsv; do
    [ -f "$t" ] || continue
    python -m neural_sp_tpu.bin.asr.eval \
      --recog_model "$exp/asr" --recog_sets "$t" \
      $recog_flags $lm_args --recog_dir "$exp/decode"
  done
fi
