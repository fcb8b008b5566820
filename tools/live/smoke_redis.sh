#!/usr/bin/env bash
# Redis day-one smoke: full PSYNC (RDB + tail) through the resident
# lane; the RDB covers the pre-dial keys.
set -euo pipefail
. "$(dirname "$0")/common.sh"

SINK="$STATE_DIR/redis-sink"
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
resident=true
max_segment_secs=2
capture_retention=true

[sinker]
url=$SINK
CFG
start_task redis_smoke "$INI"
wait_rows "$SINK/redis.snapshot" 1000 180
# live tail AFTER the dial: the current-state face must fold it
rcli set tail:1 one > /dev/null
rcli set tail:2 two > /dev/null
rcli del k0 > /dev/null
sleep 8
stop_task redis_smoke
expect_rows "$SINK/redis.snapshot" 1000
# redis.state = RDB keys + tail SETs - DELs (1000 - 1 + 2)
expect_rows "$SINK/redis.state" 1001
