#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 Next #1/#4/#5/#6):
#   probe_precision — per-stage MXU rounding diagnosis (part 5 table)
#   tier_test_mxu   — fixed one-hot MXU kernel vs flat gather on chip
#   q14mxu/q14mxu2  — deformable infer b=16, sampling_gather=mxu (2x noise)
#   q14btrain_mxu   — deformable train b=8 with the kernel's custom VJP
#   q14btrain_patch — deformable train b=8, patch gather (c-minor residual
#                     layout fix for the round-4 32x-padding OOM)
#   q16dtrace       — DETR train b=8 with --trace-dir (the unexplained
#                     50.5 img/s train vs 501 infer ratio)
#   rr1/rr2/rr3     — flagship b=32 infer repeat runs (noise column)
#   rrf1/rrf2/rrf3  — FCOS b=32 infer repeat runs (second family sigma)
# Same done-marker protocol as r4 (/tmp/tpu_r5_done), resumable.
cd "$(dirname "$0")/.."
log=${1:-/tmp/tpu_meas_r5.log}
D=/tmp/tpu_r5_done
mkdir -p "$D"

probe() {
  timeout 3600 python -c "import jax, jax.numpy as jnp; print('probe ok', float(jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())))" >> "$log" 2>&1
}

step() {
  local id=$1 to=$2 rc
  shift 2
  [ -e "$D/$id" ] && return 0
  [ -e "$D/$id.skip" ] && return 0
  echo "== [$id] $* ($(date -u +%FT%TZ))" | tee -a "$log"
  timeout "$to" "$@" >> "$log" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    touch "$D/$id"
    echo "   [$id] OK ($(date -u +%T))" | tee -a "$log"
    return 0
  fi
  echo "   [$id] FAIL rc=$rc ($(date -u +%T))" | tee -a "$log"
  echo x >> "$D/$id.fails"
  if [ "$(wc -l < "$D/$id.fails")" -ge 2 ]; then
    mv "$D/$id.fails" "$D/$id.skip"
    echo "   [$id] SKIPPED after 2 failures (write a KERNELS.md entry!)" | tee -a "$log"
  fi
  return 1
}

BM="python -m tpudet.cli.benchmark"
DD="--preset coco_deformable_detr_r50"
IDS="probe_precision tier_test_mxu q14mxu q14mxu2 q14btrain_mxu q14btrain_patch q16dtrace rr1 rr2 rr3 rrf1 rrf2 rrf3"

run_pending() {
  step probe_precision 1800 python scripts/mxu_precision_probe.py || return 1
  step tier_test_mxu 1800 env TPUDET_TEST_TPU=1 python -m pytest "tests/test_tpu.py::test_deformable_mxu_kernel_on_tpu" -m tpu -x -q || return 1
  step q14mxu 2400 $BM $DD --mode infer --batch-size 16 --iters 10 --set deformable_detr.sampling_gather=mxu || return 1
  step q14mxu2 2400 $BM $DD --mode infer --batch-size 16 --iters 10 --set deformable_detr.sampling_gather=mxu || return 1
  step q14btrain_mxu 3600 $BM $DD --mode train --batch-size 8 --iters 8 --set deformable_detr.sampling_gather=mxu || return 1
  step q14btrain_patch 3600 $BM $DD --mode train --batch-size 8 --iters 8 --set deformable_detr.sampling_gather=patch || return 1
  step q16dtrace 2400 $BM --preset coco_detr_r50 --mode train --batch-size 8 --iters 4 --trace-dir /tmp/detr_train_trace || return 1
  step rr1 2400 $BM --preset voc_r50 --mode infer --batch-size 32 --iters 20 || return 1
  step rr2 2400 $BM --preset voc_r50 --mode infer --batch-size 32 --iters 20 || return 1
  step rr3 2400 $BM --preset voc_r50 --mode infer --batch-size 32 --iters 20 || return 1
  step rrf1 2400 $BM --preset coco_fcos_r50 --mode infer --batch-size 32 --iters 20 || return 1
  step rrf2 2400 $BM --preset coco_fcos_r50 --mode infer --batch-size 32 --iters 20 || return 1
  step rrf3 2400 $BM --preset coco_fcos_r50 --mode infer --batch-size 32 --iters 20 || return 1
  return 0
}

all_done() {
  for id in $IDS; do
    [ -e "$D/$id" ] || [ -e "$D/$id.skip" ] || return 1
  done
  return 0
}

for attempt in $(seq 1 30); do
  if all_done; then
    echo "R5 ALL DONE ($(date -u +%FT%TZ))" | tee -a "$log"
    exit 0
  fi
  echo "-- r5 pass $attempt: probing ($(date -u +%FT%TZ))" | tee -a "$log"
  if probe; then
    run_pending && continue
    sleep 60
  else
    echo "-- r5 tunnel wedged; sleeping 240" | tee -a "$log"
    sleep 240
  fi
done
echo "R5 EXHAUSTED ($(date -u +%FT%TZ))" | tee -a "$log"
exit 1
