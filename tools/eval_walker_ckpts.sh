#!/bin/bash
# Post-hoc checkpoint evals for the walker_walk 500k protocol
# (reference README.md:51 seeds / 500k budget; see README "Status" table).
# Usage: tools/eval_walker_ckpts.sh <seed> [steps...]
# Evals each work_dirs/walker_500k/<seed>/models/model_<step> checkpoint
# with 10 deterministic episodes and files the statistics under
# work_dirs/walker_500k/<seed>/eval/statistics_<k>k.csv.
set -euo pipefail
cd "$(dirname "$0")/.."
SEED="${1:?usage: eval_walker_ckpts.sh <seed> [steps...]}"
shift
STEPS=("${@:-100000 250000 500000}")
[ $# -eq 0 ] && STEPS=(100000 250000 500000)
RUN_DIR="work_dirs/walker_500k/${SEED}"
mkdir -p "${RUN_DIR}/eval"
for STEP in "${STEPS[@]}"; do
  CKPT="${RUN_DIR}/models/model_${STEP}"
  if [ ! -e "${CKPT}" ]; then
    echo "skip: ${CKPT} missing" >&2
    continue
  fi
  OUT="work_dirs/walker_eval_${SEED}_${STEP}"
  rm -rf "${OUT}"
  python -m pointcloud_rl_tpu.apis.run_rl configs/mfrl/sac/dm_control/pn_walker_tpu.py \
    --work-dir "${OUT}" --seed "${SEED}" --evaluation \
    --resume-from "${CKPT}" \
    --cfg-options eval_cfg.num=10 eval_cfg.save_video=False
  K="$((STEP / 1000))k"
  cp "${OUT}"/*/eval/statistics.csv "${RUN_DIR}/eval/statistics_${K}.csv" 2>/dev/null \
    || cp "${OUT}"/eval/statistics.csv "${RUN_DIR}/eval/statistics_${K}.csv"
  echo "== seed ${SEED} @${K}:"
  python - "$RUN_DIR/eval/statistics_${K}.csv" <<'EOF'
import csv, statistics, sys
rows = list(csv.DictReader(open(sys.argv[1])))
rs = [float(r["reward"]) for r in rows]
print(f"  eval {statistics.mean(rs):.1f} +/- {statistics.stdev(rs):.1f} over {len(rs)} episodes")
EOF
done
