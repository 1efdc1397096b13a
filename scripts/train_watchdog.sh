#!/bin/bash
# Watchdog-wrapped CLI training for the flaky axon worker: relaunch on
# stall (train_log.jsonl not advancing), resume from the latest
# checkpoint each time.  Usage:
#   train_watchdog.sh <config> <expid> <max_iter> <log> [extra --set ...]
set -u
CONFIG=$1; EXPID=$2; MAXIT=$3; LOG=$4; shift 4
TRAIN_LOG="experiments_out/$EXPID/train/train_log.jsonl"
STALL_S=240

while true; do
  last=$(tail -1 "$TRAIN_LOG" 2>/dev/null | python -c \
    "import json,sys; print(json.load(sys.stdin)['step'])" 2>/dev/null || echo 0)
  if [ "$last" -ge "$MAXIT" ]; then echo "WATCHDOG: done at $last"; break; fi
  echo "WATCHDOG: (re)launching from step $last" >> "$LOG"
  python -m patchperpix_tpu.cli --config "$CONFIG" --root experiments_out \
    -id "$EXPID" --set "training.max_iterations=$MAXIT" \
    --set training.checkpoints=2000 "$@" -d train >> "$LOG" 2>&1 &
  PID=$!
  echo $PID > /tmp/train_watchdog.pid
  LAUNCH=$(date +%s)
  # first compile takes minutes (more for the code-head model) and
  # writes nothing; killing mid-compile can wedge the axon worker
  GRACE=${WATCHDOG_GRACE:-480}
  # monitor: kill on stall (log older than STALL_S, measured only
  # against progress made SINCE this launch)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    [ $(( now - LAUNCH )) -lt $GRACE ] && continue
    if [ -f "$TRAIN_LOG" ]; then
      mt=$(stat -c %Y "$TRAIN_LOG")
      ref=$(( mt > LAUNCH ? mt : LAUNCH ))
      age=$(( now - ref ))
      if [ "$age" -gt "$STALL_S" ]; then
        echo "WATCHDOG: stall (${age}s); killing $PID" >> "$LOG"
        kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
        sleep 90   # let the axon worker recover
        break
      fi
    fi
  done
  wait $PID 2>/dev/null
  sleep 5
done
