#!/usr/bin/env bash
# ami recipe (reference examples/ami/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/conformer_las.yaml} UNIT=${UNIT:-wp} \
exec ../common/run_asr.sh "$@"
