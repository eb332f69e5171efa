#!/bin/bash
# End-to-end CLI training throughput with REAL JPEG decode at the recipe
# canvas (VERDICT r4 item 3): runs the shipped train_VOC.py loop on
# shapes-VOC JPEGs at INPUT 800x1344 with the per-depth gb8 deployment
# regime, and reports img/s + data_time so the host pipeline (native C
# decoder + prefetch) is proven — or bounded — at recipe scale.
#
#   bash scripts/run_recipe_throughput.sh /root/data/shapes_voc_500 /root/runs_pipe
set -e
cd "$(dirname "$0")/.."
ROOT=${1:-/root/data/shapes_voc_500}
RUNS=${2:-/root/runs_pipe}
STEPS=${STEPS:-200}
mkdir -p "$RUNS"

COMMON="SOLVER.MAX_ITER $STEPS SOLVER.BASE_LR 0.002 \
  SOLVER.WARMUP_ITERS 100 SOLVER.CHECKPOINT_PERIOD 1000000 \
  TEST.EVAL_PERIOD 0 DATASETS.TEST () \
  INPUT.MIN_SIZE_TRAIN (800,) INPUT.MAX_SIZE_TRAIN 1344"

echo "=== R-50, flat global batch 8 (8 strong + 8 weak images/step) ==="
python scripts/train_VOC.py \
  --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
  --data-root "$ROOT" MODEL.WEIGHTS "" \
  OUTPUT_DIR "$RUNS/r50_gb8" MODEL.RESNETS.DEPTH 50 \
  SOLVER.IMS_PER_BATCH 8 \
  $COMMON \
  2>&1 | tee "$RUNS/r50_gb8.log" | grep -E "iter|data_time" | tail -20

echo "=== R-101, GRAD_ACCUM 2 x (4+4) (the accumulated gb8 regime) ==="
python scripts/train_VOC.py \
  --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
  --data-root "$ROOT" MODEL.WEIGHTS "" \
  OUTPUT_DIR "$RUNS/r101_gb8" \
  SOLVER.IMS_PER_BATCH 4 TPU.GRAD_ACCUM 2 \
  $COMMON \
  2>&1 | tee "$RUNS/r101_gb8.log" | grep -E "iter|data_time" | tail -20

echo "=== summary (median step wall / data_time from metrics.json) ==="
for d in r50_gb8 r101_gb8; do
  python - "$RUNS/$d/metrics.json" <<'PYEOF'
import json, statistics, sys
recs = [json.loads(l) for l in open(sys.argv[1])]
recs = [r for r in recs if r.get("iteration", 0) > 50]  # past warmup/compile
dt = [r["data_time"] for r in recs if "data_time" in r]
print(f"{sys.argv[1]}: steps logged {len(recs)}, "
      f"median data_time {statistics.median(dt):.5f} s" if dt else "no data_time")
PYEOF
done