#!/bin/bash
# Preemption-chained training: run a config in bounded chunks until the
# configured total_steps is reached, surviving relay deaths, scheduler
# kills, and wall-clock limits.
#
# Each chunk is `timeout <chunk> run_rl --auto-resume`:
#   - SIGTERM from `timeout` is trapped by train_rl (graceful preemption):
#     the cycle finishes, a NUMBERED checkpoint is written, workers tear
#     down cleanly.
#   - the next chunk's --auto-resume picks up the newest model_<step>.
#   - a hard kill (OOM, relay wedge) costs at most train_cfg.n_checkpoint
#     steps; the chain continues.
#
# PCRL_CHAIN_DEADLINE=<epoch seconds>: hard wall-clock budget.  Chunks are
# shrunk to fit and the chain exits 0 once less than 2 minutes remain, so a
# chained run sharing a single-tenant device frees it ON TIME for whatever
# is scheduled next (e.g. the benchmark harness) instead of holding the
# relay mid-chunk.
#
# Usage: tools/chain_run.sh <config.py> <work_dir> <seed> [chunk_seconds] [-- extra run_rl args]
set -uo pipefail
cd "$(dirname "$0")/.."
CFG="${1:?usage: chain_run.sh <config.py> <work_dir> <seed> [chunk_seconds] [-- extra args]}"
WORK="${2:?work_dir}"
SEED="${3:?seed}"
shift 3
# chunk_seconds is optional: only consume $4 when it is numeric, so
# `chain_run.sh cfg wd seed -- extra` works as documented.
CHUNK=2400
if [[ "${1:-}" =~ ^[0-9]+$ ]]; then
  CHUNK="$1"
  shift
fi
[ "${1:-}" == "--" ] && shift

while true; do
  THIS_CHUNK="${CHUNK}"
  if [ -n "${PCRL_CHAIN_DEADLINE:-}" ]; then
    REMAIN=$(( PCRL_CHAIN_DEADLINE - $(date +%s) ))
    if [ "${REMAIN}" -lt 120 ]; then
      echo "chain_run: deadline reached (${REMAIN}s left); stopping cleanly"
      break
    fi
    # leave 60 s for the graceful-preemption checkpoint + worker teardown
    [ $(( REMAIN - 60 )) -lt "${THIS_CHUNK}" ] && THIS_CHUNK=$(( REMAIN - 60 ))
  fi
  timeout "${THIS_CHUNK}" python -m pointcloud_rl_tpu.apis.run_rl "${CFG}" \
    --work-dir "${WORK}" --seed "${SEED}" --auto-resume "$@"
  status=$?
  if [ "${status}" -eq 0 ]; then
    echo "chain_run: training finished (run_rl exited 0)"
    break
  fi
  # 124 = timeout expiry (SIGTERM), 143/137 = external TERM/KILL, 3 = stall
  # watchdog (wedged device session, utils/watchdog.py): these are
  # preemptions — resume.  Anything else is a permanent error (bad config,
  # import failure): retry a bounded number of times, then give up, so a
  # typo doesn't loop forever.
  if [ "${status}" -eq 124 ] || [ "${status}" -eq 143 ] || [ "${status}" -eq 137 ] || [ "${status}" -eq 3 ]; then
    echo "chain_run: chunk preempted (exit ${status}); resuming in 5 s"
    sleep 5
  else
    FAILS=$(( ${FAILS:-0} + 1 ))
    if [ "${FAILS}" -ge 3 ]; then
      echo "chain_run: run_rl failed ${FAILS} times with non-preemption exit ${status}; giving up"
      exit "${status}"
    fi
    echo "chain_run: run_rl failed (exit ${status}, attempt ${FAILS}/3); retrying in 15 s"
    sleep 15
  fi
done
