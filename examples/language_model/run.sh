#!/usr/bin/env bash
# PTB / WikiText2 LM recipe (reference examples/language_model analog).
# Expects $DATA/{train,dev,test}.tsv with a `text` column (make_dataset
# can create them from raw text).
set -euo pipefail
cd "$(dirname "$0")"
data=${DATA:-./data}
exp=${EXP:-./exp}
conf=${CONF:-conf/rnnlm_ptb.yaml}
python -m neural_sp_tpu.bin.lm.train --config "$conf" \
  --train_set "$data/train.tsv" --dev_set "$data/dev.tsv" \
  --dict "$data/dict_word.txt" --model_save_dir "$exp/lm"
python -m neural_sp_tpu.bin.lm.eval \
  --recog_model "$exp/lm" --recog_sets "$data/test.tsv"
