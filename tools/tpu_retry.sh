#!/bin/bash
# Retry a TPU command until the axon tunnel gives us a device window, with a
# stall watchdog: if the command's CPU time stops advancing for ~4 min (the
# tunnel dropped mid-run and the RPC is blocked forever), kill it and retry.
# Usage: tools/tpu_retry.sh <cmd...>
cd "$(dirname "$0")/.."
for attempt in $(seq 1 20); do
  echo "--- attempt $attempt: probing device ($(date +%H:%M:%S))" >&2
  if ! timeout 150 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "--- tunnel down, sleeping 60s" >&2
    sleep 60
    continue
  fi
  echo "--- device up, running: $*" >&2
  "$@" &
  pid=$!
  last_cpu=""
  stall=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    cpu=$(ps -o cputimes= -p "$pid" 2>/dev/null | tr -d ' ')
    [ -z "$cpu" ] && break
    if [ "$cpu" = "$last_cpu" ]; then
      stall=$((stall + 1))
    else
      stall=0
    fi
    last_cpu="$cpu"
    if [ "$stall" -ge 20 ]; then
      echo "--- stalled (cpu=$cpu for 10 min), killing pid $pid" >&2
      kill "$pid" 2>/dev/null
      sleep 2
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  if wait "$pid"; then
    exit 0
  fi
  echo "--- run failed/stalled, retrying" >&2
  sleep 30
done
echo "--- gave up after 20 attempts" >&2
exit 1
