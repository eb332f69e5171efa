#!/bin/bash
# End-to-end COCO-suite accuracy pipeline on the real-protocol shapes-COCO
# dataset: instance-SEGMENTATION base training -> eval-only from the best
# checkpoint -> 10-shot segm fine-tune -> final eval.  Exercises the shipped
# COCO segm configs (mask head + similarity mask transfer + COCO evaluator
# with novel slicing) through the exact user-facing CLI.
# Usage: [ITERS=4000] [EXTRA_OPTS=...] run_shapes_coco_pipeline.sh <root> <runs>
set -e
cd "$(dirname "$0")/.."
ROOT=${1:-/root/data/shapes_coco}
RUNS=${2:-/root/coco_runs}
ITERS=${ITERS:-4000}
mkdir -p "$RUNS"

COMMON="INPUT.MIN_SIZE_TRAIN (320,) INPUT.MAX_SIZE_TRAIN 320 INPUT.MIN_SIZE_TEST 320 INPUT.MAX_SIZE_TEST 320 ${EXTRA_OPTS:-}"

echo "=== [1/3] COCO segm base training ($ITERS iters) ==="
python scripts/train_VOC.py \
  --config-file configs/COCO/COCO-RCNN-50-C4-split1-segm.yaml \
  --data-root "$ROOT" \
  OUTPUT_DIR "$RUNS/base" \
  MODEL.WEIGHTS "" \
  SOLVER.MAX_ITER $ITERS SOLVER.IMS_PER_BATCH 4 \
  SOLVER.STEPS "($((ITERS*2/3)),)" \
  SOLVER.CHECKPOINT_PERIOD 500 TEST.EVAL_PERIOD 500 \
  $COMMON \
  2>&1 | tee "$RUNS/base.log"

echo "=== [2/3] eval-only from best checkpoint ==="
python scripts/train_VOC.py \
  --config-file configs/COCO/COCO-RCNN-50-C4-split1-segm.yaml \
  --data-root "$ROOT" --eval-only \
  OUTPUT_DIR "$RUNS/base_eval" \
  MODEL.WEIGHTS "$RUNS/base/best/model" \
  $COMMON \
  2>&1 | tee "$RUNS/base_eval.log"

echo "=== [3/3] 10-shot segm fine-tune ==="
python scripts/finetune_VOC.py \
  --config-file configs/COCO/COCO-RCNN-50-C4-split1-segm-ft.yaml \
  --data-root "$ROOT" \
  OUTPUT_DIR "$RUNS/ft10" \
  MODEL.WEIGHTS "$RUNS/base/best/model" \
  SOLVER.MAX_ITER 300 SOLVER.IMS_PER_BATCH 4 TEST.EVAL_PERIOD 300 \
  SOLVER.CHECKPOINT_PERIOD 150 \
  $COMMON \
  2>&1 | tee "$RUNS/ft10.log"

echo "=== pipeline done ==="
grep -h "csv:" "$RUNS"/*/log.txt 2>/dev/null | tail -60
