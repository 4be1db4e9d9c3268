#!/usr/bin/env bash
# Tiny end-to-end CI recipe (reference examples/ci_test + test/test_training.sh
# analog): synthesises a corpus, trains LM + several ASR variants, decodes,
# plots, force-aligns, and resumes — all CPU-runnable.
set -euo pipefail
work=${1:-/tmp/nsp_ci}
rm -rf "$work"; mkdir -p "$work"

# Hung-compile-worker guard (remote TPU pools hang random processes —
# ROADMAP env notes): every CLI preflights a trivial compile
# (NSP_PREFLIGHT=1 -> exit 3 on a hung worker) and the stage is retried
# into a fresh worker; rc 124 = a post-preflight hang caught by timeout.
# No-op on CPU backends. All stages are idempotent under re-run.
export NSP_PREFLIGHT=${NSP_PREFLIGHT:-1}
py() {
  local rc=0 i
  for i in 1 2 3 4 5 6; do
    timeout "${NSP_STAGE_TIMEOUT:-1200}" python "$@" && return 0
    rc=$?
    { [ "$rc" -eq 3 ] || [ "$rc" -eq 124 ]; } || return "$rc"
    echo "=== stage retry $i (rc=$rc, hung worker) ===" >&2
  done
  return "$rc"
}

python - "$work" <<'EOF'
import sys
from neural_sp_tpu.utils.ci_corpus import make_ci_corpus
make_ci_corpus(sys.argv[1] + "/data", n_train=16, n_dev=4, n_test=4)
EOF
data="$work/data"

common="--train_set $data/train.tsv --dev_set $data/dev.tsv --dict $data/dict_char.txt
  --unit char --batch_size 16 --bucketing sort --n_epochs 2 --optimizer adam
  --lr 3e-3 --print_step 5 --min_n_frames 1 --enc_n_units 24 --dec_n_units 24
  --dec_n_layers 1 --emb_dim 12 --dec_bottleneck_dim 24 --attn_dim 24
  --attn_conv_width 9 --lsm_prob 0.0"

echo "=== LM ==="
py -m neural_sp_tpu.bin.lm.train --train_set "$data/train_word.tsv" \
  --dev_set "$data/dev_word.tsv" --dict "$data/dict_word.txt" \
  --model_save_dir "$work/lm" --lm_type lstm --unit word --n_units 24 \
  --n_layers 1 --emb_dim 12 --batch_size 4 --bptt 10 --n_epochs 2 --lr 3e-3
py -m neural_sp_tpu.bin.lm.eval --recog_model "$work/lm" \
  --recog_sets "$data/test_word.tsv"

echo "=== ASR: BLSTM-LAS+CTC ==="
py -m neural_sp_tpu.bin.asr.train $common \
  --enc_type blstm --enc_n_layers 1 --dec_type lstm --ctc_weight 0.3 \
  --model_save_dir "$work/las"

echo "=== ASR: RNN-T ==="
py -m neural_sp_tpu.bin.asr.train $common \
  --enc_type blstm --enc_n_layers 1 --dec_type lstm_transducer \
  --transducer_joint_dim 24 --ctc_weight 0.0 --model_save_dir "$work/rnnt"

echo "=== ASR: streaming transformer CTC ==="
py -m neural_sp_tpu.bin.asr.train $common \
  --enc_type uni_transformer --enc_n_layers 2 --transformer_d_model 24 \
  --transformer_d_ff 48 --transformer_n_heads 2 \
  --transformer_enc_pe_type relative --lc_chunk_size_left 16 \
  --lc_chunk_size_current 8 --lc_chunk_size_right 0 --lc_type mask \
  --dec_type lstm --ctc_weight 1.0 --model_save_dir "$work/stream"

echo "=== resume ==="
py -m neural_sp_tpu.bin.asr.train $common \
  --enc_type blstm --enc_n_layers 1 --dec_type lstm --ctc_weight 0.3 \
  --model_save_dir "$work/las" --resume "$work/las/ckpt.epoch-2" --n_epochs 3

echo "=== char LM (fusion + rescoring member) ==="
py -m neural_sp_tpu.bin.lm.train --train_set "$data/train.tsv" \
  --dev_set "$data/dev.tsv" --dict "$data/dict_char.txt" \
  --model_save_dir "$work/lm_char" --lm_type lstm --unit char --n_units 24 \
  --n_layers 1 --emb_dim 12 --batch_size 4 --bptt 10 --n_epochs 1 --lr 3e-3

echo "=== second ASR model (ensemble member) ==="
py -m neural_sp_tpu.bin.asr.train $common \
  --enc_type blstm --enc_n_layers 1 --dec_type lstm --ctc_weight 0.3 \
  --seed 7 --model_save_dir "$work/las2"

echo "=== decode: shallow fusion + joint CTC ==="
py -m neural_sp_tpu.bin.asr.eval --recog_model "$work/las" \
  --recog_sets "$data/test.tsv" --recog_beam_width 4 --recog_ctc_weight 0.3 \
  --recog_length_norm true --recog_n_average 2 \
  --recog_lm "$work/lm_char" --recog_lm_weight 0.3 --recog_dir "$work/decode"

echo "=== decode: second-pass + backward LM rescoring ==="
py -m neural_sp_tpu.bin.asr.eval --recog_model "$work/las" \
  --recog_sets "$data/test.tsv" --recog_beam_width 4 --recog_n_best 4 \
  --recog_lm_second "$work/lm_char" --recog_lm_second_weight 0.2 \
  --recog_lm_bwd "$work/lm_char" --recog_lm_bwd_weight 0.1 \
  --recog_dir "$work/decode2"

echo "=== decode: ensemble ==="
py -m neural_sp_tpu.bin.asr.eval --recog_model "$work/las" \
  --recog_sets "$data/test.tsv" --recog_beam_width 4 \
  --recog_ensemble "$work/las2" --recog_dir "$work/decode3"

echo "=== decode: on-device batched beam + oracle ==="
py -m neural_sp_tpu.bin.asr.eval --recog_model "$work/las" \
  --recog_sets "$data/test.tsv" --recog_beam_width 4 \
  --recog_device_beam true --recog_dir "$work/decode4"
py -m neural_sp_tpu.bin.asr.eval --recog_model "$work/las" \
  --recog_sets "$data/test.tsv" --recog_beam_width 4 \
  --recog_oracle true --recog_dir "$work/decode5"

echo "=== decode: streaming block-sync ==="
py -m neural_sp_tpu.bin.asr.eval --recog_model "$work/stream" \
  --recog_sets "$data/test.tsv" --recog_beam_width 2 \
  --recog_streaming true --recog_dir "$work/decode6"

echo "=== plots + alignment ==="
py -m neural_sp_tpu.bin.asr.plot_attention --recog_model "$work/las" \
  --recog_sets "$data/test.tsv"
py -m neural_sp_tpu.bin.asr.plot_ctc --recog_model "$work/las" \
  --recog_sets "$data/test.tsv"
py -m neural_sp_tpu.bin.asr.ctc_forced_align --recog_model "$work/las" \
  --recog_sets "$data/test.tsv"
echo "ci_test OK"
