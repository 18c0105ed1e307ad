#!/bin/bash
# ViTDet learning-proof tail: wait for the vitdet_tiny from-scratch train
# (launched session-side, log /tmp/vitdet_proof.log) to finish, then run
# the eval CLI (parity referee) on the final checkpoint -> synthetic
# mAP@0.5 for the family's README/SURVEY proof row. CPU-only — never
# touches the TPU tunnel.
set -u
cd "$(dirname "$0")/.."
log=${1:-/tmp/vitdet_eval.log}

for i in $(seq 1 300); do
  if grep -q "training done" /tmp/vitdet_proof.log 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "training done" /tmp/vitdet_proof.log 2>/dev/null; then
  echo "vitdet train never finished; last lines:" | tee -a "$log"
  tail -5 /tmp/vitdet_proof.log | tee -a "$log"
  exit 1
fi
echo "== vitdet eval ($(date -u +%FT%TZ))" | tee -a "$log"
TPUDET_PLATFORM=cpu timeout 7200 python -m tpudet.cli.eval \
  --preset vitdet_tiny --dataset synthetic \
  --checkpoint-dir /tmp/vitdet_proof --max-images 512 --batch-size 8 \
  --no-mesh --metric voc >> "$log" 2>&1
echo "== vitdet eval done rc=$? ($(date -u +%FT%TZ))" | tee -a "$log"
