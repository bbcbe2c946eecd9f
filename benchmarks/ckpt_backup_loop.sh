#!/bin/bash
# Insurance against host re-images: checkpoints live under gitignored
# artifacts/**/*_ckpt/ dirs, so a VM re-image (which restores /root/repo
# from git) silently destroys every checkpoint and forces chip runs to
# restart from step 0 — this has now happened twice to the flagship chain.
#
# This loop tars the LATEST model_{step} checkpoint of each run arm into
# git-tracked artifacts/ckpt_backup/<name>.tar and commits it whenever the
# step advances. Each commit replaces the previous tarball, so the working
# tree holds only one backup per arm (history keeps old blobs; that is the
# price of durability here). Restore after a re-image:
#
#   tar -xf artifacts/ckpt_backup/flagship_linear.tar -C /
#   (paths inside the tar are absolute-relative: artifacts/flagship/...)
#
# Usage: nohup bash benchmarks/ckpt_backup_loop.sh > /dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/ckpt_backup
INTERVAL=${BACKUP_INTERVAL_S:-1800}

latest_ckpt() { # $1 = *_ckpt dir -> newest COMPLETE model_N subdir (or empty)
  for d in $(ls -d "$1"/model_* 2>/dev/null | grep -v '\.tmp$' | sort -t_ -k2 -n -r); do
    # atomic-save aware: skip in-flight/partial dirs (same completeness
    # rule as sow_tpu.checkpoint.complete_checkpoints)
    if [ -s "$d/model.safetensors" ] && [ -s "$d/training_state.json" ]; then
      echo "$d"; return
    fi
  done
}

while true; do
  for ckdir in artifacts/flagship/*_ckpt artifacts/conv9m/*_ckpt artifacts/flagship_r4/*_ckpt artifacts/r4/*_ckpt; do
    [ -d "$ckdir" ] || continue
    src=$(latest_ckpt "$ckdir")
    [ -n "$src" ] || continue
    # name: flagship_linear, conv9m_sow, ...
    name="$(basename "$(dirname "$ckdir")")_$(basename "$ckdir" _ckpt)"
    step=$(basename "$src" | sed 's/model_//')
    stamp="artifacts/ckpt_backup/.${name}.step"
    [ -f "$stamp" ] && [ "$(cat "$stamp")" = "$step" ] && continue
    # skip checkpoints still being written: require training_state.json
    # and a quiet period (no file modified in the last 30s)
    [ -f "$src/training_state.json" ] || continue
    newest=$(find "$src" -type f -newermt "-30 seconds" | head -1)
    [ -n "$newest" ] && continue
    # nice everything: the chip run owns the host (CPU contention measurably
    # throttles the tunnel client — see PARITY.md fault-tolerance notes)
    nice -n 19 tar -cf "artifacts/ckpt_backup/${name}.tar" "$src" 2>/dev/null || continue
    echo "$step" > "$stamp"
    nice -n 19 git add -- "artifacts/ckpt_backup/${name}.tar" "$stamp" 2>/dev/null
    git commit -q -m "Checkpoint backup: ${name} step ${step}

No-Verification-Needed: binary artifact backup, no code change" \
      -- "artifacts/ckpt_backup/${name}.tar" "$stamp" || true
    echo "[ckpt-backup] committed ${name} step ${step} ($(date -u +%H:%M:%S))"
  done
  sleep "$INTERVAL"
done
