#!/usr/bin/env bash
# timit recipe (reference examples/timit/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/blstm_ctc.yaml} \
UNIT=${UNIT:-phone} \
RECOG_FLAGS=${RECOG_FLAGS:-"--recog_beam_width 10 --recog_length_norm true --recog_phone_map timit_39"} \
exec ../common/run_asr.sh "$@"
