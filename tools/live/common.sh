#!/usr/bin/env bash
# Shared harness for the live smoke scripts: run one RESIDENT graft
# task against a compose-started server, wait for the landed rows,
# stop the task through the CLI, and diff the landed parquet. Resident
# + stop is the only bounded shape — a drain-once session never ends
# against a healthy server (heartbeats keep the wire warm forever).
# Requires: docker compose up -d, sbt on PATH, pyarrow for the diff.
set -euo pipefail
cd "$(dirname "$0")/../.."

STATE_DIR="${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke}"
TASK_PID=""

start_task() { # name ini-file
  local name="$1" ini="$2"
  rm -rf "$STATE_DIR/$name"
  mkdir -p "$STATE_DIR/$name"
  sbt -batch "runMain graft.TaskCli $STATE_DIR create $name $ini"
  sbt -batch "runMain graft.TaskCli $STATE_DIR start $name" &
  TASK_PID=$!
}

stop_task() { # name
  sbt -batch "runMain graft.TaskCli $STATE_DIR stop $1"
  wait "$TASK_PID"
}

count_rows() { # parquet table dir (part files may sit under seg=*/)
  python3 - "$1" <<'PY'
import sys, glob
try:
    import pyarrow.parquet as pq
except ImportError:
    sys.exit("pyarrow required for the smoke diff")
files = glob.glob(sys.argv[1] + "/**/*.parquet", recursive=True)
print(sum(pq.ParquetFile(f).metadata.num_rows for f in files))
PY
}

wait_rows() { # parquet-dir want timeout-secs
  local dir="$1" want="$2" deadline=$(( $(date +%s) + ${3:-120} ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if [ "$(count_rows "$dir" 2>/dev/null || echo 0)" -ge "$want" ]
    then return 0; fi
    sleep 3
  done
  echo "TIMEOUT waiting for $want rows in $dir" >&2
  return 1
}

expect_rows() { # parquet-dir want
  local got
  got="$(count_rows "$1")"
  if [ "$got" -ne "$2" ]; then
    echo "FAIL: $1 has $got rows, want $2" >&2
    exit 1
  fi
  echo "OK: $1 rows=$got"
}
