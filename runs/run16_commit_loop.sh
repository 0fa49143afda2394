#!/bin/bash
# Hourly artifact-preservation loop for run-16 (TRAINING_GUIDE 7h: only
# committed files survive VM reboots).  Copies the NEWEST snapshot,
# best_latest, the training history, and a buffer manifest (not the
# buffer itself — hundreds of MB) into the tracked runs_tracked/run16/
# and commits.  Stop with: kill $(cat /tmp/run16_commit.pid)
cd /root/repo
echo $$ > /tmp/run16_commit.pid
DIR=runs/models_run16
OUT=runs_tracked/run16
mkdir -p $OUT
while true; do
  sleep 1800
  SNAP=$(ls $DIR/snapshot_iter*.ckpt 2>/dev/null | sort -V | tail -1)
  [ -z "$SNAP" ] && continue
  cp -f "$SNAP" $OUT/snapshot_latest.ckpt
  basename "$SNAP" > $OUT/snapshot_latest.name
  [ -f $DIR/best_latest.ckpt ] && cp -f $DIR/best_latest.ckpt $OUT/best_latest.ckpt
  for H in $DIR/history*.json $DIR/*history*.json; do
    [ -f "$H" ] && cp -f "$H" $OUT/
  done
  BUF=$DIR/replay_buffer_latest.npz
  if [ -f "$BUF" ]; then
    { stat -c "%s %Y" "$BUF"; md5sum "$BUF"; } > $OUT/buffer_manifest.txt 2>/dev/null
  fi
  tail -200 runs/run16.log > $OUT/run16_log_tail.txt 2>/dev/null
  git add -f $OUT >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "run-16 checkpoint preservation: $(cat $OUT/snapshot_latest.name 2>/dev/null)"
done
