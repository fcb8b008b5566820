#!/usr/bin/env bash
# Shared harness for the live smoke scripts: run one graft task through
# the task CLI against a compose-started server and diff the landed
# parquet against expectations. Requires: docker compose up -d, sbt on
# PATH, run from the repo root's tools/live dir.
set -euo pipefail
cd "$(dirname "$0")/../.."

STATE_DIR="${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke}"

run_task() { # name ini-file
  local name="$1" ini="$2"
  rm -rf "$STATE_DIR/$name"
  mkdir -p "$STATE_DIR/$name"
  sbt -batch "runMain graft.TaskCli $STATE_DIR create $name $ini"
  sbt -batch "runMain graft.TaskCli $STATE_DIR start $name"
}

count_rows() { # parquet-dir
  python3 - "$1" <<'PY'
import sys, glob
try:
    import pyarrow.parquet as pq
except ImportError:
    sys.exit("pyarrow required for the smoke diff")
n = sum(pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(sys.argv[1] + "/*.parquet"))
print(n)
PY
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
