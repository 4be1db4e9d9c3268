#!/usr/bin/env bash
# aishell2 recipe (reference examples/aishell2/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/conformer_las.yaml} UNIT=${UNIT:-char} \
exec ../common/run_asr.sh "$@"
