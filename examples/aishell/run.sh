#!/usr/bin/env bash
# aishell recipe (reference examples/aishell/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/conformer_las.yaml} \
UNIT=${UNIT:-char} \
exec ../common/run_asr.sh "$@"
