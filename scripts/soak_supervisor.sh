#!/usr/bin/env bash
# Supervise full_schedule_soak.py across axon-tunnel wedges.
#
# The tunnel to the single v5e chip can drop a session mid-run (observed
# 3x on 2026-08-20: a device fetch blocks forever in a futex wait; the
# soak's watchdog then hard-exits 3 with a {"wedged": ...} log record).
# This supervisor is the recovery half: wait for the server-side grant to
# release (probe with a tiny jitted add under `timeout`), then relaunch
# the soak with --resume, which restores the latest periodic checkpoint —
# the same contract as the framework's own `--resume auto`
# (gan_variant_research_tpu/train/loop.py:118-170).
#
#   scripts/soak_supervisor.sh [STEPS] [DEADLINE_EPOCH]
#
# Exit: 0 = soak completed; 4 = deadline hit; anything else = a real soak
# failure (NaN, crash) passed through — those must NOT be retried.
set -u
cd "$(dirname "$0")/.."

STEPS=${1:-15000}
DEADLINE=${2:-$(($(date +%s) + 10800))}
OUT=runs/full_schedule_soak
mkdir -p "$OUT"
# Run-dir-scoped like the soak's own pid file (commit 99e886a): a fixed
# /tmp path is clobbered by concurrent runs, so an operator may kill the
# wrong supervisor.
echo $$ > "$OUT/supervisor.pid"
attempt=0

while :; do
  attempt=$((attempt + 1))
  echo "$(date -u +%FT%TZ) attempt=$attempt launching (resume)" >> "$OUT/supervisor.log"
  python scripts/full_schedule_soak.py --steps "$STEPS" --resume \
    --wedge-timeout 300 >> "$OUT/stdout.log" 2>&1
  rc=$?
  echo "$(date -u +%FT%TZ) attempt=$attempt rc=$rc" >> "$OUT/supervisor.log"
  [ "$rc" -eq 0 ] && exit 0
  [ "$rc" -ne 3 ] && exit "$rc"   # real failure — do not loop on it

  # Wedged: the dead client's grant takes ~2-5 min to release server-side.
  while :; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "$(date -u +%FT%TZ) deadline hit while waiting for chip" >> "$OUT/supervisor.log"
      exit 4
    fi
    sleep 120
    if timeout -k 10 90 python -c \
        'import jax; jax.jit(lambda x: x + 1)(1).block_until_ready()' \
        >/dev/null 2>&1; then
      echo "$(date -u +%FT%TZ) chip probe ok" >> "$OUT/supervisor.log"
      break
    fi
    echo "$(date -u +%FT%TZ) chip probe failed, retrying" >> "$OUT/supervisor.log"
  done
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then exit 4; fi
done
