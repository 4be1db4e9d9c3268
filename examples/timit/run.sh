#!/usr/bin/env bash
# timit recipe (reference examples/timit/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/blstm_ctc.yaml} \
UNIT=${UNIT:-phone} \
exec ../common/run_asr.sh "$@"
