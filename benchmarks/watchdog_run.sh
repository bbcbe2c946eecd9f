#!/bin/bash
# Hang-watchdog wrapper for long chip runs over the tunneled TPU.
#
# The tunnel can wedge mid-run (observed: a 25k-step flagship run went
# fully idle — every thread in futex wait — minutes after a VM restart,
# with no exception for the trainer's in-process --auto-restart to catch).
# A hang is invisible to `set -e`; the only robust recovery is an external
# monitor on the run's progress file.
#
# Usage:
#   watchdog_run.sh PROGRESS_FILE STALE_SECS MAX_RETRIES RESUME_DIR -- cmd...
#
# Runs `cmd...`; if BOTH PROGRESS_FILE's and PROGRESS_FILE.hb's mtimes go
# stale for STALE_SECS while the command is alive, kills the process group
# and reruns with `--continue-from RESUME_DIR` appended (the pretrain CLI
# resumes params, optimizer state, and step count from the latest COMPLETE
# checkpoint there, falling back past broken dirs).
#
# PROGRESS_FILE.hb is the trainer's liveness heartbeat
# (sow_tpu/utils/heartbeat.py): touched during checkpoint saves, evals,
# and XLA (re)compiles — the long legitimate pauses that round 4's
# mtime-only watchdog misread as hangs (it SIGKILLed the flagship
# resetsched arm mid-save at step 12000, twice). Beats are capped
# per-scope, so a tunnel wedge *inside* a save still gets killed, just on
# a longer fuse. On kill, the last heartbeat line is logged so the post-
# mortem can see what the trainer was doing.
# RESUME_DIR=- disables the resume flag (plain rerun). Exits with the
# command's final status.
set -u
PROGRESS=$1; STALE=$2; RETRIES=$3; RESUME=$4; shift 4
[ "$1" = "--" ] && shift
POLL=${WD_POLL:-30}   # poll interval; overridable so tests run fast
HB="$PROGRESS.hb"

attempt=0
extra=()
while :; do
  setsid "$@" "${extra[@]}" &
  pid=$!
  start=$(date +%s)
  # NB: the child stays a zombie until `wait`, and `kill -0` succeeds on
  # zombies — poll /proc state so a finished run is noticed within 30s
  # instead of after STALE seconds.
  while state=$(awk '{print $3}' "/proc/$pid/stat" 2>/dev/null) \
        && [ -n "$state" ] && [ "$state" != "Z" ]; do
    sleep "$POLL"
    state=$(awk '{print $3}' "/proc/$pid/stat" 2>/dev/null)
    [ -z "$state" ] || [ "$state" = "Z" ] && break
    now=$(date +%s)
    mt=$start
    for f in "$PROGRESS" "$HB"; do
      if [ -f "$f" ]; then
        m=$(stat -c %Y "$f")
        [ "$m" -gt "$mt" ] && mt=$m
      fi
    done
    # ref covers the fresh-process grace too: STALE secs to first write
    ref=$mt
    if [ $(( now - ref )) -gt "$STALE" ]; then
      last_hb="(no heartbeat file)"
      [ -f "$HB" ] && last_hb="last heartbeat: $(cat "$HB" 2>/dev/null)"
      echo "[watchdog] no progress on $PROGRESS or .hb for $((now - ref))s — killing pg $pid; $last_hb" >&2
      kill -9 -- -"$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  status=$?
  [ $status -eq 0 ] && exit 0
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$RETRIES" ]; then
    echo "[watchdog] giving up after $attempt attempts (status $status)" >&2
    exit "$status"
  fi
  echo "[watchdog] attempt $attempt/$RETRIES: rerunning (status $status)" >&2
  if [ "$RESUME" != "-" ] && ls "$RESUME"/*/ >/dev/null 2>&1; then
    extra=(--continue-from "$RESUME")
  fi
  sleep "${WD_RETRY_SLEEP:-10}"
done
