#!/bin/bash
# Round-4 third queue: the one-hot MXU deformable-attention kernel
# (kernels/deform_attn_mxu.py, landed after tpu_run_r4b.sh started).
#   tier_test_mxu   — kernel vs flat gather on the chip (fwd + bwd dV)
#   q14mxu/q14mxu2  — deformable infer b=16 with sampling_gather=mxu,
#                     twice to bound noise (the number this kernel exists
#                     to move: flat measured 0.54 img/s/chip)
#   q14btrain_mxu   — deformable train b=8 with the kernel's custom VJP
#                     (flat measured 0.16 img/s)
# SERIALIZE: launched by a waiter on tpu_run_r4b.sh's PID. Same
# done-marker protocol (/tmp/tpu_r4_done), same log.
cd "$(dirname "$0")/.."
log=${1:-/tmp/tpu_meas_r4.log}
D=/tmp/tpu_r4_done
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
    echo "   [$id] SKIPPED after 2 failures" | tee -a "$log"
  fi
  return 1
}

BM="python -m tpudet.cli.benchmark"

run_pending() {
  step tier_test_mxu 1800 env TPUDET_TEST_TPU=1 python -m pytest "tests/test_tpu.py::test_deformable_mxu_kernel_on_tpu" -m tpu -x -q || return 1
  step q14mxu 2400 $BM --preset coco_deformable_detr_r50 --mode infer --batch-size 16 --iters 10 --set deformable_detr.sampling_gather=mxu || return 1
  step q14mxu2 2400 $BM --preset coco_deformable_detr_r50 --mode infer --batch-size 16 --iters 10 --set deformable_detr.sampling_gather=mxu || return 1
  step q14btrain_mxu 2400 $BM --preset coco_deformable_detr_r50 --mode train --batch-size 8 --iters 8 --set deformable_detr.sampling_gather=mxu || return 1
  return 0
}

all_done() {
  for id in tier_test_mxu q14mxu q14mxu2 q14btrain_mxu; do
    [ -e "$D/$id" ] || [ -e "$D/$id.skip" ] || return 1
  done
  return 0
}

for attempt in $(seq 1 20); do
  if all_done; then
    echo "R4C ALL DONE ($(date -u +%FT%TZ))" | tee -a "$log"
    exit 0
  fi
  echo "-- r4c pass $attempt: probing ($(date -u +%FT%TZ))" | tee -a "$log"
  if probe; then
    run_pending && continue
    sleep 60
  else
    echo "-- r4c tunnel wedged; sleeping 240" | tee -a "$log"
    sleep 240
  fi
done
echo "R4C EXHAUSTED ($(date -u +%FT%TZ))" | tee -a "$log"
exit 1
