#!/usr/bin/env bash
# tedlium recipe (reference examples/tedlium/s5/run.sh analog).
cd "$(dirname "$0")"
CONF=${CONF:-conf/conformer_las.yaml} \
UNIT=${UNIT:-wp} \
exec ../common/run_asr.sh "$@"
