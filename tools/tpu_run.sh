#!/bin/bash
# Run a python script on the TPU with retry-on-stall (the axon tunnel
# intermittently hangs new process registrations for minutes; see
# .claude/skills/verify/SKILL.md gotchas). Usage: tpu_run.sh <script.py> [timeout_s] [retries]
SCRIPT="$1"
TIMEOUT="${2:-420}"
RETRIES="${3:-3}"
for i in $(seq 1 "$RETRIES"); do
  timeout "$TIMEOUT" python -u "$SCRIPT" && exit 0
  code=$?
  if [ $code -ne 124 ]; then
    echo "[tpu_run] attempt $i failed with code $code (not a timeout)" >&2
    exit $code
  fi
  echo "[tpu_run] attempt $i timed out; backing off 45s" >&2
  sleep 45
done
echo "[tpu_run] all $RETRIES attempts timed out" >&2
exit 124
