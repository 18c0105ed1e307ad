#!/bin/bash
# Round-4 follow-on queue: measurements for code that landed AFTER
# tpu_run_r4.sh started (the runner script cannot be edited while bash is
# executing it — bash reads scripts incrementally).
#   q15a/q15b — ViTDet-B (models/vit.py, preset coco_vitdet_b): the
#               transformer-backbone family's first real-chip numbers.
#   tier_test_vitdet — ViTDet predict+step on the chip's arithmetic
#               (Mosaic/XLA attention at real window shapes).
# SERIALIZE: run only after tpu_run_r4.sh exits (scripts/chain_r4b.sh
# waits on its PID). Same done-marker protocol, same log.
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
  # Longer-timeout retries for main-queue steps that hit their caps
  # (cascade train compile exceeded 1100 s — the r3 lesson again).
  if [ -e "$D/q10b.skip" ] && [ ! -e "$D/q10b_retry" ] && [ ! -e "$D/q10b_retry.skip" ]; then
    step q10b_retry 2400 $BM --preset coco_cascade_r50_fpn --mode train --batch-size 8 --iters 8 || return 1
  fi
  if [ -e "$D/q11b.skip" ] && [ ! -e "$D/q11b_retry" ] && [ ! -e "$D/q11b_retry.skip" ]; then
    step q11b_retry 2400 $BM --preset coco_keypoint_r50_fpn --mode train --batch-size 8 --iters 8 || return 1
  fi
  if [ -e "$D/q12b.skip" ] && [ ! -e "$D/q12b_retry" ] && [ ! -e "$D/q12b_retry.skip" ]; then
    step q12b_retry 2400 $BM --preset coco_panoptic_r50_fpn --mode train --batch-size 8 --iters 8 || return 1
  fi
  # Deformable 29.86 s/batch pathology (q14a): trace first, then the
  # gather-formulation microbench — the fix must be measurement-driven.
  step q14trace 1800 $BM --preset coco_deformable_detr_r50 --mode infer --batch-size 2 --iters 2 --trace-dir /tmp/ddetr_trace || return 1
  step gmb 1800 python scripts/gather_microbench.py || return 1
  step tier_test_vitdet 1800 env TPUDET_TEST_TPU=1 python -m pytest "tests/test_tpu.py::test_vitdet_step_and_predict_on_tpu" -m tpu -x -q || return 1
  step q15a 1800 $BM --preset coco_vitdet_b --mode infer --batch-size 16 --iters 10 || return 1
  step q15b 1800 $BM --preset coco_vitdet_b --mode train --batch-size 8 --iters 8 || return 1
  # Deformable gather A/B at the MODEL level (commit 5d48926): the patch
  # formulation (4x fewer indices, exact) and the head-shared variant
  # (4*H x fewer, config-gated model change) vs the recorded flat 0.54
  # img/s/chip. Generous timeouts: the flat run took 24 min wall.
  step tier_test_ddetr_patch 1800 env TPUDET_TEST_TPU=1 python -m pytest "tests/test_tpu.py::test_deformable_patch_gather_matches_flat_on_tpu" -m tpu -x -q || return 1
  step q14patch 2400 $BM --preset coco_deformable_detr_r50 --mode infer --batch-size 16 --iters 10 --set deformable_detr.sampling_gather=patch || return 1
  step q14shared 2400 $BM --preset coco_deformable_detr_r50 --mode infer --batch-size 16 --iters 10 --set deformable_detr.sampling_gather=patch --set deformable_detr.shared_sampling_locations=True || return 1
  step q14btrain_patch 2400 $BM --preset coco_deformable_detr_r50 --mode train --batch-size 8 --iters 8 --set deformable_detr.sampling_gather=patch || return 1
  return 0
}

all_done() {
  for id in q14trace gmb tier_test_vitdet q15a q15b tier_test_ddetr_patch q14patch q14shared q14btrain_patch; do
    [ -e "$D/$id" ] || [ -e "$D/$id.skip" ] || return 1
  done
  return 0
}

for attempt in $(seq 1 20); do
  if all_done; then
    echo "R4B ALL DONE ($(date -u +%FT%TZ))" | tee -a "$log"
    exit 0
  fi
  echo "-- r4b pass $attempt: probing ($(date -u +%FT%TZ))" | tee -a "$log"
  if probe; then
    run_pending && continue
    sleep 60
  else
    echo "-- r4b tunnel wedged; sleeping 240" | tee -a "$log"
    sleep 240
  fi
done
echo "R4B EXHAUSTED ($(date -u +%FT%TZ))" | tee -a "$log"
exit 1
