#!/bin/bash
# The reference DrQ point-cloud protocol on walker_walk: 500k env steps,
# seeds 1000/2000/3000 (reference README.md:51), run SEQUENTIALLY (the
# tunneled TPU is single-tenant) via the preemption-chained runner so relay
# deaths / wall-clock kills resume warm.
#
# Usage: tools/walker_drq_protocol.sh [seed...]   (default: 1000 2000 3000)
set -uo pipefail
cd "$(dirname "$0")/.."
SEEDS=("${@:-1000 2000 3000}")
[ $# -eq 0 ] && SEEDS=(1000 2000 3000)
for SEED in "${SEEDS[@]}"; do
  # run_rl appends /<seed> to --work-dir: final layout walker_drq_500k/<seed>
  WD="work_dirs/walker_drq_500k"
  # "finished" = a numbered checkpoint at total_steps exists.  model_final
  # alone is NOT completion: the graceful-preemption path also writes it
  # (at whatever step the chunk was killed), so checking it would skip a
  # half-done seed.
  if [ -e "${WD}/${SEED}/models/model_500000" ]; then
    echo "== seed ${SEED}: already finished, skipping"
    continue
  fi
  echo "== seed ${SEED}: starting chained run -> ${WD}/${SEED}"
  tools/chain_run.sh configs/mfrl/drq/dm_control/pn_shift_walker_tpu.py \
    "${WD}" "${SEED}" 2400 || {
      echo "== seed ${SEED}: chain_run gave up (non-preemption failure); continuing with next seed" >&2
      continue
    }
done
echo "== all seeds done"
