#!/bin/bash
# Recipe-length soak (VERDICT r4 item 4): the FULL 30k-iter VOC schedule —
# LR steps at 12k/24k, periodic eval + best-AP50 rotation (max_to_keep 3) —
# on shapes-VOC at a reduced canvas, with one SIGTERM mid-run and a --resume,
# verifying the resumed loss curve is continuous and the best-AP bookkeeping
# survives the preemption.  Reference recipe being soaked:
# /root/reference/configs/VOC/VOC-RCNN-101-C4-split1.yaml:42-51.
#
#   bash scripts/run_soak.sh /root/data/shapes_voc /root/runs_soak
set -e
cd "$(dirname "$0")/.."
ROOT=${1:-/root/data/shapes_voc}
RUNS=${2:-/root/runs_soak}
ITERS=${ITERS:-30000}
KILL_AT=${KILL_AT:-15000}
mkdir -p "$RUNS"

# From-scratch settings (no MSRA pickle in the image): FREEZE_AT 0 and a
# gentler LR than the recipe's 0.02-at-batch-8 — the schedule SHAPE (30k,
# steps 12k/24k, warmup, eval/ckpt cadence) is the thing under test.
OPTS="OUTPUT_DIR $RUNS/soak \
  SOLVER.MAX_ITER $ITERS SOLVER.IMS_PER_BATCH 4 \
  SOLVER.BASE_LR 0.004 SOLVER.WARMUP_ITERS 1000 \
  SOLVER.STEPS (12000,24000) \
  SOLVER.CHECKPOINT_PERIOD 2000 TEST.EVAL_PERIOD 2000 \
  MODEL.BACKBONE.FREEZE_AT 0 \
  INPUT.MIN_SIZE_TRAIN (320,) INPUT.MAX_SIZE_TRAIN 320 \
  INPUT.MIN_SIZE_TEST 320 INPUT.MAX_SIZE_TEST 320"

echo "=== soak stage 1: train to ~$KILL_AT then SIGTERM ==="
python scripts/train_VOC.py \
  --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
  --data-root "$ROOT" MODEL.WEIGHTS "" $OPTS > "$RUNS/stage1.log" 2>&1 &
PID=$!
echo $PID > "$RUNS/train.pid"

# wait until metrics.json crosses KILL_AT, then preempt
while kill -0 $PID 2>/dev/null; do
  sleep 30
  LAST=$(tail -1 "$RUNS/soak/metrics.json" 2>/dev/null | python -c \
    "import sys,json;print(json.load(sys.stdin).get('iteration',0))" 2>/dev/null || echo 0)
  echo "  iter $LAST"
  if [ "${LAST:-0}" -ge "$KILL_AT" ]; then
    echo "=== SIGTERM at iter $LAST ==="
    kill -TERM $PID
    break
  fi
done
wait $PID || true
if [ "$(tail -1 "$RUNS/soak/metrics.json" 2>/dev/null | python -c \
  "import sys,json;print(json.load(sys.stdin).get('iteration',0))")" -ge "$ITERS" ]; then
  echo "!!! run finished before SIGTERM fired — soak still valid but no preempt"
fi

echo "=== soak stage 2: --resume to $ITERS ==="
python scripts/train_VOC.py \
  --config-file configs/VOC/VOC-RCNN-101-C4-split1.yaml \
  --data-root "$ROOT" --resume MODEL.WEIGHTS "" $OPTS > "$RUNS/stage2.log" 2>&1

echo "=== soak verify ==="
python scripts/verify_soak.py "$RUNS/soak" --iters "$ITERS"
