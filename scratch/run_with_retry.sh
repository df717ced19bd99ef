#!/bin/bash
# Run a chip script with wedge detection: if the log doesn't contain
# INIT_OK within 90s of launch, kill and relaunch (max 5 tries).
SCRIPT="$1"; shift
LOG="$1"; shift
for try in 1 2 3 4 5; do
  : > "$LOG"
  python -u "$SCRIPT" "$@" >> "$LOG" 2>&1 &
  PID=$!
  for i in $(seq 1 18); do
    sleep 5
    grep -q INIT_OK "$LOG" && break
    kill -0 $PID 2>/dev/null || break
  done
  if grep -q INIT_OK "$LOG"; then
    wait $PID
    exit $?
  fi
  echo "(try $try: init wedged, relaunching)" >> "$LOG.retries"
  kill $PID 2>/dev/null; sleep 3
done
echo "giving up after 5 wedged inits" >> "$LOG.retries"
exit 1
