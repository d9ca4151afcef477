#!/bin/bash
# Post-hoc checkpoint evals for a protocol run (reference README.md:51
# protocol: eval tables at fixed checkpoints).  Generalizes
# eval_walker_ckpts.sh to any config/run dir (SAC or DrQ).
#
# Usage: tools/eval_run_ckpts.sh <config.py> <run_dir> <seed> [steps...]
#   <run_dir> is the work dir that CONTAINS models/ (e.g.
#   work_dirs/walker_drq_500k/1000).  Defaults: 100000 250000 500000.
# Writes <run_dir>/eval/statistics_<k>k.csv and prints a summary.
# Set PCRL_EVAL_PLATFORM=cpu to keep the TPU free for a concurrent run.
set -euo pipefail
cd "$(dirname "$0")/.."
CFG="${1:?usage: eval_run_ckpts.sh <config.py> <run_dir> <seed> [steps...]}"
RUN_DIR="${2:?run_dir}"
SEED="${3:?seed}"
shift 3
STEPS=("${@}")
[ ${#STEPS[@]} -eq 0 ] && STEPS=(100000 250000 500000)
mkdir -p "${RUN_DIR}/eval"
for STEP in "${STEPS[@]}"; do
  CKPT="${RUN_DIR}/models/model_${STEP}"
  if [ ! -e "${CKPT}" ]; then
    echo "skip: ${CKPT} missing" >&2
    continue
  fi
  OUT="${RUN_DIR}/eval_tmp_${STEP}"
  rm -rf "${OUT}"
  JAX_PLATFORMS="${PCRL_EVAL_PLATFORM:-cpu}" \
  python -m pointcloud_rl_tpu.apis.run_rl "${CFG}" \
    --work-dir "${OUT}" --seed "${SEED}" --evaluation \
    --resume-from "${CKPT}" \
    --cfg-options eval_cfg.num=10 eval_cfg.save_video=False eval_cfg.num_procs=1
  K="$((STEP / 1000))k"
  cp "${OUT}"/*/eval/statistics.csv "${RUN_DIR}/eval/statistics_${K}.csv" 2>/dev/null \
    || cp "${OUT}"/eval/statistics.csv "${RUN_DIR}/eval/statistics_${K}.csv"
  rm -rf "${OUT}"
  echo "== ${RUN_DIR} @${K}:"
  python - "${RUN_DIR}/eval/statistics_${K}.csv" <<'EOF'
import csv, statistics, sys
rows = list(csv.DictReader(open(sys.argv[1])))
rs = [float(r["reward"]) for r in rows]
sd = statistics.stdev(rs) if len(rs) > 1 else 0.0
print(f"  eval {statistics.mean(rs):.1f} +/- {sd:.1f} over {len(rs)} episodes")
EOF
done
