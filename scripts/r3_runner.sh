#!/usr/bin/env bash
# Round-3 chip-greedy stage queue (VERDICT r2 #7): executes
# scripts/r3_queue.d/NN_*.sh in lexical order, re-globbing between stages so
# stages can be inserted/edited mid-round without touching a running script
# (bash reads scripts incrementally — editing a running one corrupts it).
# A stage is skipped once logs/stamps/<name>.done exists; after MAX_TRIES
# failures it is parked as .skipped and the queue moves on (a dead stage
# must never idle the chip while later stages are pending).
cd "$(dirname "$0")/.."
# Single-runner lock: a leftover runner from a previous session sleeping in
# its queue-empty loop will otherwise wake up and race this one over the
# same stages (observed r4: two trainers on one experiment dir for 2 h —
# halved throughput and risked torn orbax milestones).
# ADVICE r4: the old read-check-then-echo acquisition was racy (two
# near-simultaneous runners could both pass the kill -0 check).  flock on a
# dedicated lock fd is atomic and held for the runner's lifetime; the
# legacy pidfile liveness check stays so a new-script runner still refuses
# to race an old-script runner that predates the flock protocol.
exec 9>/tmp/campaign_r3.lock
if ! flock -n 9; then
  echo "[r3] another runner holds /tmp/campaign_r3.lock; refusing to start"
  exit 1
fi
if [ -e /tmp/campaign_r3.pid ]; then
  old=$(cat /tmp/campaign_r3.pid)
  if [ -n "$old" ] && [ "$old" != "$$" ] && kill -0 "$old" 2>/dev/null; then
    echo "[r3] another runner (pid $old) is alive; refusing to start"
    exit 1
  fi
fi
echo $$ > /tmp/campaign_r3.pid
mkdir -p logs/stamps artifacts/eval results
MAX_TRIES=${MAX_TRIES:-5}
while true; do
  next=""
  for s in ${QUEUE_DIR:-scripts/r3_queue.d}/[0-9]*.sh; do
    [ -e "$s" ] || continue
    base=$(basename "$s" .sh)
    [ -e "logs/stamps/$base.done" ] && continue
    [ -e "logs/stamps/$base.skipped" ] && continue
    next="$s"; break
  done
  if [ -z "$next" ]; then
    echo "[r3] queue empty $(date -u +%H:%M:%S); sleeping 300s (new stages may appear)"
    sleep 300
    continue
  fi
  base=$(basename "$next" .sh)
  tries_f="logs/stamps/$base.tries"
  tries=$(cat "$tries_f" 2>/dev/null || echo 0)
  echo "[r3] >>> stage $base (try $((tries + 1))) $(date -u +%H:%M:%S)"
  if bash "$next"; then
    touch "logs/stamps/$base.done"
    echo "[r3] <<< stage $base DONE $(date -u +%H:%M:%S)"
  else
    rc=$?
    tries=$((tries + 1)); echo "$tries" > "$tries_f"
    echo "[r3] stage $base FAILED rc=$rc (try $tries) $(date -u +%H:%M:%S)"
    if [ "$tries" -ge "$MAX_TRIES" ]; then
      touch "logs/stamps/$base.skipped"
      echo "[r3] stage $base parked as .skipped after $tries tries"
    else
      sleep 60
    fi
  fi
done
