#!/usr/bin/env bash
# Redis day-one smoke: full PSYNC (RDB + tail) landed as tables.
set -euo pipefail
. "$(dirname "$0")/common.sh"

SINK="${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke}/redis-sink"
rm -rf "$SINK"; mkdir -p "$SINK"

rcli() { docker compose -f tools/live/docker-compose.yml exec -T \
  redis redis-cli "$@"; }

rcli flushall
for i in $(seq 0 999); do rcli set "k$i" "v$i" > /dev/null; done

INI="$(mktemp)"; cat > "$INI" <<CFG
[extractor]
db_type=redis
extract_type=cdc
url=redis://127.0.0.1:6379
repl_port=10008

[sinker]
url=$SINK
CFG
run_task redis_smoke "$INI"
expect_rows "$SINK/redis.snapshot" 1000
