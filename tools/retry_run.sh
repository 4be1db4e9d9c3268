#!/bin/bash
# Retry a TPU tool up to N times (the remote compile pool hangs at random;
# each tool preflights and exits 3 on a hung worker). Usage:
#   tools/retry_run.sh <logfile> <cmd...>
log="$1"; shift
: > "$log"
for i in 1 2 3 4 5 6 7 8; do
  echo "=== attempt $i $(date +%T) ===" >> "$log"
  timeout 1200 "$@" >> "$log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$log"
  [ $rc -eq 0 ] && break
  sleep 5
done
echo "DONE rc=$rc" >> "$log"
