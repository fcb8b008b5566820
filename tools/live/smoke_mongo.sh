#!/usr/bin/env bash
# MongoDB day-one smoke: open the change stream FIRST (a stream only
# sees what happens after the watch), write while resident, stop.
set -euo pipefail
. "$(dirname "$0")/common.sh"

SINK="$STATE_DIR/mongo-sink"
rm -rf "$SINK"; mkdir -p "$SINK"

msh() { docker compose -f tools/live/docker-compose.yml exec -T \
  mongo mongosh --quiet --eval "$1"; }

msh 'try { rs.status() } catch (e) { rs.initiate() }'
INI="$(mktemp)"; cat > "$INI" <<CFG
[extractor]
db_type=mongo
extract_type=cdc
url=mongodb://127.0.0.1:27017
resident=true
max_segment_secs=2
capture_retention=true

[sinker]
url=$SINK
CFG
start_task mongo_smoke "$INI"
sleep 20
msh 'for (let i = 0; i < 100; i++) db.getSiblingDB("smoke").t.insertOne({_id: i, v: "v" + i})'
wait_rows "$SINK/mongo.changes" 100 120
stop_task mongo_smoke
expect_rows "$SINK/mongo.changes" 100
# current-state face: one row per inserted _id
expect_rows "$SINK/smoke.t" 100
