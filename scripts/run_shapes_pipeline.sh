#!/bin/bash
# End-to-end accuracy pipeline on the real-protocol shapes-VOC dataset:
#   base train (reduced schedule) -> eval-only from the best checkpoint ->
#   10-shot fine-tune warm-started from it -> final eval.
# Exercises the exact user-facing CLI path (train_VOC.py / finetune_VOC.py with
# the shipped split-1 configs + dotted overrides), producing measured mAP for
# BASELINE.md.  Run from the repo root; results land in /root/runs/.
set -e
cd "$(dirname "$0")/.."
ROOT=${1:-/root/data/shapes_voc}
RUNS=${2:-/root/runs}
ITERS=${ITERS:-600}
mkdir -p "$RUNS"

# EXTRA_OPTS: additional dotted config overrides for every stage, e.g.
# EXTRA_OPTS="MODEL.BACKBONE.FREEZE_AT 0" for from-scratch runs (no MSRA
# pickle in the image: a frozen random stem cripples learning).
COMMON_INPUT="INPUT.MIN_SIZE_TRAIN (320,) INPUT.MAX_SIZE_TRAIN 320 INPUT.MIN_SIZE_TEST 320 INPUT.MAX_SIZE_TEST 320 ${EXTRA_OPTS:-}"

echo "=== [1/3] base training ($ITERS iters) ==="
python scripts/train_VOC.py \
  --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
  --data-root "$ROOT" \
  OUTPUT_DIR "$RUNS/shapes_base" \
  MODEL.WEIGHTS "" \
  SOLVER.MAX_ITER $ITERS SOLVER.IMS_PER_BATCH 4 SOLVER.BASE_LR 0.01 \
  SOLVER.STEPS "($((ITERS*2/3)),)" SOLVER.WARMUP_ITERS 100 \
  SOLVER.CHECKPOINT_PERIOD 200 TEST.EVAL_PERIOD 300 \
  $COMMON_INPUT \
  2>&1 | tee "$RUNS/shapes_base.log"

echo "=== [2/3] eval-only from best checkpoint ==="
python scripts/train_VOC.py \
  --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
  --data-root "$ROOT" --eval-only \
  OUTPUT_DIR "$RUNS/shapes_base_eval" \
  MODEL.WEIGHTS "$RUNS/shapes_base/best/model" \
  $COMMON_INPUT \
  2>&1 | tee "$RUNS/shapes_base_eval.log"

echo "=== [3/3] 10-shot fine-tune ==="
python scripts/finetune_VOC.py \
  --config-file configs/VOC/FT/10_shot/VOC-RCNN-101-C4-split1-ft.yaml \
  --data-root "$ROOT" \
  OUTPUT_DIR "$RUNS/shapes_ft10" \
  MODEL.WEIGHTS "$RUNS/shapes_base/best/model" \
  SOLVER.MAX_ITER 300 SOLVER.IMS_PER_BATCH 4 TEST.EVAL_PERIOD 300 \
  SOLVER.CHECKPOINT_PERIOD 150 \
  $COMMON_INPUT \
  2>&1 | tee "$RUNS/shapes_ft10.log"

echo "=== pipeline done ==="
grep -h "csv:" "$RUNS"/shapes_base.log "$RUNS"/shapes_base_eval.log "$RUNS"/shapes_ft10.log | tail -40
