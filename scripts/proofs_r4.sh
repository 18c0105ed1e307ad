#!/bin/bash
# Round-4 CPU-side learning proofs (VERDICT r3 item 5): the two families
# that still lack one.
#   1. Deformable DETR: deformable_detr_tiny from scratch on synthetic
#      scenes (paper recipe: AdamW 2e-4, backbone 0.1x, clip 0.1), then the
#      eval CLI (parity referee) on the final checkpoint -> mAP@0.5.
#      The train itself is launched by the session (background, ~75 min at
#      the measured ~4.45 steps/s on this 1-vCPU host); this script WAITS
#      for it (done = train log's final "training done." line) and evals.
#   2. Panoptic FPN: panoptic_tiny from scratch (same 3000-step budget the
#      Mask R-CNN proof used), eval -> PQ/SQ/RQ + semantic mIoU.
# Runs entirely under TPUDET_PLATFORM=cpu — never touches the TPU tunnel,
# so it can run alongside scripts/tpu_run_r4.sh.
set -u
cd "$(dirname "$0")/.."
log=${1:-/tmp/proofs_r4.log}

echo "== proofs_r4 start ($(date -u +%FT%TZ))" | tee -a "$log"

# --- 1. deformable DETR: wait for the training launched by the session ---
for i in $(seq 1 400); do
  if grep -q "training done" /tmp/ddetr_proof_train.log 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "training done" /tmp/ddetr_proof_train.log 2>/dev/null; then
  echo "ddetr train never finished; last lines:" | tee -a "$log"
  tail -5 /tmp/ddetr_proof_train.log | tee -a "$log"
else
  echo "== ddetr eval ($(date -u +%FT%TZ))" | tee -a "$log"
  TPUDET_PLATFORM=cpu timeout 5400 python -m tpudet.cli.eval \
    --preset deformable_detr_tiny --dataset synthetic \
    --checkpoint-dir /tmp/ddetr_proof --max-images 512 --batch-size 8 \
    --no-mesh --metric voc >> "$log" 2>&1
  echo "== ddetr eval done rc=$? ($(date -u +%FT%TZ))" | tee -a "$log"
fi

# --- 2. panoptic FPN PQ proof ---
echo "== panoptic train ($(date -u +%FT%TZ))" | tee -a "$log"
rm -rf /tmp/panoptic_proof
# --dataset synthetic keeps load_semantic=True from the preset and widens
# to 8 thing classes (same override the FCOS/DETR proofs trained with).
TPUDET_PLATFORM=cpu timeout 14400 python -m tpudet.cli.train \
  --preset panoptic_tiny --dataset synthetic --steps 3000 --batch-size 8 \
  --lr 0.02 --seed 0 --no-mesh --set train.checkpoint_every=1000 \
  --checkpoint-dir /tmp/panoptic_proof >> "$log" 2>&1
echo "== panoptic train done rc=$? ($(date -u +%FT%TZ))" | tee -a "$log"
echo "== panoptic eval ($(date -u +%FT%TZ))" | tee -a "$log"
TPUDET_PLATFORM=cpu timeout 5400 python -m tpudet.cli.eval \
  --preset panoptic_tiny --dataset synthetic \
  --checkpoint-dir /tmp/panoptic_proof --max-images 256 --batch-size 8 \
  --no-mesh >> "$log" 2>&1
echo "== panoptic eval done rc=$? ($(date -u +%FT%TZ))" | tee -a "$log"
echo "== proofs_r4 end ($(date -u +%FT%TZ))" | tee -a "$log"
