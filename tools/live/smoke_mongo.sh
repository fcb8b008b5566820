#!/usr/bin/env bash
# MongoDB day-one smoke: change-stream capture landed as mongo.changes.
set -euo pipefail
. "$(dirname "$0")/common.sh"

SINK="${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke}/mongo-sink"
rm -rf "$SINK"; mkdir -p "$SINK"

msh() { docker compose -f tools/live/docker-compose.yml exec -T \
  mongo mongosh --quiet --eval "$1"; }

msh 'try { rs.status() } catch (e) { rs.initiate() }'
# open the stream FIRST (a change stream only sees what happens after
# the watch), so run the task resident in the background, then write
INI="$(mktemp)"; cat > "$INI" <<CFG
[extractor]
db_type=mongo
extract_type=cdc
url=mongodb://127.0.0.1:27017
resident=true
max_segment_secs=2

[sinker]
url=$SINK
CFG
rm -rf "${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke}/mongo_smoke"
mkdir -p "${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke}/mongo_smoke"
sbt -batch "runMain graft.TaskCli ${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke} create mongo_smoke $INI"
sbt -batch "runMain graft.TaskCli ${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke} start mongo_smoke" &
TASK_PID=$!
sleep 20
msh 'for (let i = 0; i < 100; i++) db.getSiblingDB("smoke").t.insertOne({_id: i, v: "v" + i})'
sleep 10
sbt -batch "runMain graft.TaskCli ${GRAFT_SMOKE_STATE:-/tmp/graft-live-smoke} stop mongo_smoke"
wait "$TASK_PID"
expect_rows "$SINK/mongo.changes" 100
