#!/bin/bash
# Round-5 CPU-side learning proof (VERDICT r4 item 3): adjudicate the
# accuracy cost of `deformable_detr.shared_sampling_locations=True` — the
# fastest measured deformable variant (6.85 img/s/chip infer, 12.7x flat)
# is a MODEL change (heads share sampling points), so it gets the same
# 20k-step / b=8 / seed-0 synthetic budget as the round-4 baseline proof
# (mAP@0.5 0.5528) and the mAP delta is reported next to the speedup.
# Runs entirely under TPUDET_PLATFORM=cpu — never touches the TPU tunnel.
set -u
cd "$(dirname "$0")/.."
log=${1:-/tmp/ddetr_shared_proof.log}

echo "== ddetr shared-locations proof start ($(date -u +%FT%TZ))" | tee -a "$log"
rm -rf /tmp/ddetr_shared_proof
TPUDET_PLATFORM=cpu timeout 86400 python -m tpudet.cli.train \
  --preset deformable_detr_tiny --dataset synthetic --steps 20000 \
  --batch-size 8 --seed 0 --no-mesh \
  --set deformable_detr.sampling_gather=patch \
  --set deformable_detr.shared_sampling_locations=True \
  --set train.checkpoint_every=5000 \
  --checkpoint-dir /tmp/ddetr_shared_proof >> "$log" 2>&1
echo "== train done rc=$? ($(date -u +%FT%TZ))" | tee -a "$log"

echo "== eval ($(date -u +%FT%TZ))" | tee -a "$log"
TPUDET_PLATFORM=cpu timeout 10800 python -m tpudet.cli.eval \
  --preset deformable_detr_tiny --dataset synthetic \
  --set deformable_detr.sampling_gather=patch \
  --set deformable_detr.shared_sampling_locations=True \
  --checkpoint-dir /tmp/ddetr_shared_proof --max-images 512 --batch-size 8 \
  --no-mesh --metric voc >> "$log" 2>&1
echo "== eval done rc=$? ($(date -u +%FT%TZ))" | tee -a "$log"
echo "== ddetr shared-locations proof end ($(date -u +%FT%TZ))" | tee -a "$log"
