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
# Usage: tools/chain_run.sh <config.py> <work_dir> <seed> [chunk_seconds] [-- extra run_rl args]
set -uo pipefail
cd "$(dirname "$0")/.."
CFG="${1:?usage: chain_run.sh <config.py> <work_dir> <seed> [chunk_seconds] [-- extra args]}"
WORK="${2:?work_dir}"
SEED="${3:?seed}"
CHUNK="${4:-2400}"
shift 3
[ $# -gt 0 ] && shift   # optional chunk_seconds
[ "${1:-}" == "--" ] && shift

while true; do
  timeout "${CHUNK}" python -m pointcloud_rl_tpu.apis.run_rl "${CFG}" \
    --work-dir "${WORK}" --seed "${SEED}" --auto-resume "$@"
  status=$?
  if [ "${status}" -eq 0 ]; then
    echo "chain_run: training finished (run_rl exited 0)"
    break
  fi
  echo "chain_run: chunk ended (exit ${status}); resuming in 5 s"
  sleep 5
done
