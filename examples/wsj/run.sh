#!/usr/bin/env bash
# wsj recipe (reference examples/wsj/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/blstm_las.yaml} \
UNIT=${UNIT:-wp} \
exec ../common/run_asr.sh "$@"
