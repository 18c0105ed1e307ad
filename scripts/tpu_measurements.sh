#!/bin/bash
# Pending real-chip measurements (round 2; queued while the axon tunnel was
# wedged — see SURVEY.md §9 environment note). Run from the repo root on a
# machine with the TPU reachable. SERIALIZE: never run two TPU clients at
# once (concurrent clients wedge this environment's tunnel for everyone).
#
# Each step prints one JSON line; copy results into KERNELS.md.
# pipefail so a timeout-killed python aborts the script instead of being
# masked by tee's exit 0 — otherwise a wedged tunnel runs five serial
# ~10-minute hangs producing garbage.
set -e -o pipefail
cd "$(dirname "$0")/.."
log=${1:-/tmp/tpu_meas.log}
run() { echo "== $*" | tee -a "$log"; timeout 580 "$@" 2>&1 | tail -4 | tee -a "$log"; }

# 0. Tunnel probe (fail fast instead of hanging a full benchmark).
# 300s, not 120: a HEALTHY tunnel has been measured taking ~80s to compile
# + dispatch even an 8x8 matmul (2026-08-19); 120s false-negatived.
timeout 300 python -c "import jax, jax.numpy as jnp; print('probe', float(jax.device_get((jnp.ones((8,8)) @ jnp.ones((8,8))).sum())))" | tee -a "$log"

# 1. Blocked exact pre-NMS top-k vs the one-wide sort (coco_r101_fpn b=32):
#    expectation from the roofline: up to ~6 ms/batch of per-level lax.top_k
#    slack, P2's 129792-anchor sort dominating.
run python -m tpudet.cli.benchmark --preset coco_r101_fpn --mode infer --batch-size 32 --iters 10
run python -m tpudet.cli.benchmark --preset coco_r101_fpn --mode infer --batch-size 32 --iters 10 --set rpn.topk_method=blocked

# 2. Windowed custom-VJP training pooling vs the dense masked sum
#    (b=16 = the measured per-chip sweet spot; pooling was ~12% of the step
#    at b=8 with the masked sum).
run python -m tpudet.cli.benchmark --preset coco_r101_fpn --mode train --batch-size 16 --iters 8
run python -m tpudet.cli.benchmark --preset coco_r101_fpn --mode train --batch-size 16 --iters 8 --set roi.pooler=roi_align

# 3. Gradient accumulation: effective b=32 as 2x16 microbatches (no remat)
#    vs the b=32+remat row of the KERNELS.md batch-scaling table (71.6).
run python -m tpudet.cli.benchmark --preset coco_r101_fpn --mode train --batch-size 32 --iters 8 --set train.accum_steps=2

# 3b. Windowed-pooler v3 (in-kernel weight build) referee: same command as
#     step 1's first run — compare against the 251.8 img/s v2 number in
#     KERNELS.md (expectation: recovers part of the ~6 ms setup slice).
#     Covered by step 1 already; listed so the KERNELS.md update remembers
#     to attribute the delta to v3 + blocked-topk separately (step 1 run 1 =
#     v3 alone, run 2 = v3 + blocked).

# 3c. Profile capture for the unexplained ~7.7 ms "vmap/overhead" slice of
#     the proposals stage (KERNELS.md roofline): a Perfetto/TensorBoard
#     trace of 4 measured iterations to decompose offline.
run python -m tpudet.cli.benchmark --preset coco_r101_fpn --mode infer --batch-size 32 --iters 4 --trace-dir /tmp/trace_proposals

# 4. Flagship bench sanity (BENCH_r{N} preview) + NMS kernel us/img.
# NO outer timeout: bench.py manages its own attempt windows (12 min + 8 min
# retry); an outer `timeout` would both make the retry unreachable and
# orphan the inner `bench.py --inner` TPU client, leaving it to collide with
# step 5's client — the concurrent-client wedge the header warns about.
echo "== python bench.py" | tee -a "$log"
python bench.py 2>&1 | tail -4 | tee -a "$log"

# 5. On-TPU test tier (now includes the accum x windowed-VJP Mosaic test).
echo "== tpu test tier" | tee -a "$log"
TPUDET_TEST_TPU=1 timeout 580 python -m pytest tests/test_tpu.py -m tpu -x -q 2>&1 | tail -3 | tee -a "$log"

# 6. Cross-host artifact execution: export on CPU (lowering override embeds
#    Mosaic custom calls), then load + run the artifact on the TPU — the one
#    leg of the cross-host export story lowering tests cannot cover.
echo "== cross-host artifact" | tee -a "$log"
timeout 300 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
from tpudet.config import tiny_test_config
from tpudet.models import FasterRCNN
from tpudet.serving.export import save_artifact
cfg = tiny_test_config().replace(use_pallas=True)
m = FasterRCNN(cfg)
save_artifact('/tmp/crosshost_tiny.tpudet', cfg, m.init(jax.random.key(0)),
              batch_size=1, platforms=('tpu',))
print('exported')
" 2>&1 | tail -2 | tee -a "$log"
timeout 580 python -c "
import numpy as np
from tpudet.serving import ServingModel
m = ServingModel.load('/tmp/crosshost_tiny.tpudet')
dets = m.detect([np.zeros((100, 120, 3), np.uint8)])
print('cross-host artifact ran on TPU:', type(dets), len(dets))
" 2>&1 | tail -2 | tee -a "$log"

# 7. RetinaNet family on the real chip: first measured numbers for the
#    single-stage path (R50-FPN COCO preset, bf16). Infer b=32 + train b=8;
#    the interesting comparison is vs coco_r101_fpn's 251.8 infer (smaller
#    backbone, no RoI stage, but 9 anchors/cell heads on P3's 168x168 grid).
run python -m tpudet.cli.benchmark --preset coco_retinanet_r50 --mode infer --batch-size 32 --iters 10
run python -m tpudet.cli.benchmark --preset coco_retinanet_r50 --mode train --batch-size 8 --iters 8

# 8. Mask R-CNN family on the real chip: R50-FPN COCO preset. Infer b=16
#    (the mask branch pools ALL 100 post-NMS detections at 14^2 — ~2x the
#    box head's RoI pixels) + train b=8 (mask FCN on the 128-RoI fg prefix
#    per image). Comparison anchor: coco_r101_fpn infer 251.8 / train 71.7
#    (bigger backbone, no mask branch).
run python -m tpudet.cli.benchmark --preset coco_maskrcnn_r50_fpn --mode infer --batch-size 16 --iters 10
run python -m tpudet.cli.benchmark --preset coco_maskrcnn_r50_fpn --mode train --batch-size 8 --iters 8

# 9. FCOS family on the real chip: anchor-free R50-FPN COCO preset. Infer
#    b=32 + train b=8. Comparison anchor: coco_retinanet_r50 (same backbone
#    + pyramid; FCOS heads emit C+5 channels/location vs RetinaNet's
#    9*(C+4)/cell — ~9x fewer head FLOPs and NMS candidates per level).
run python -m tpudet.cli.benchmark --preset coco_fcos_r50 --mode infer --batch-size 32 --iters 10
run python -m tpudet.cli.benchmark --preset coco_fcos_r50 --mode train --batch-size 8 --iters 8

# 10. Cascade R-CNN family on the real chip: R50-FPN COCO preset. Infer
#     b=16 (3x head matmuls + 3x RoI pooling vs Faster R-CNN) + train b=8.
#     Comparison anchor: coco_r101_fpn infer 251.8 / train 71.7.
run python -m tpudet.cli.benchmark --preset coco_cascade_r50_fpn --mode infer --batch-size 16 --iters 10
run python -m tpudet.cli.benchmark --preset coco_cascade_r50_fpn --mode train --batch-size 8 --iters 8

# 11. Keypoint R-CNN family on the real chip: R50-FPN COCO preset. Infer
#     b=16 (the keypoint FCN is the widest branch: 8 convs at 512ch over
#     14^2 x 100 detections) + train b=8.
run python -m tpudet.cli.benchmark --preset coco_keypoint_r50_fpn --mode infer --batch-size 16 --iters 10
run python -m tpudet.cli.benchmark --preset coco_keypoint_r50_fpn --mode train --batch-size 8 --iters 8

# 12. Panoptic FPN family on the real chip: R50-FPN COCO preset (Mask
#     R-CNN + the 128ch semantic head over p2..p5 - the p2-scale convs are
#     the widest semantic-branch cost). Infer b=16 + train b=8.
run python -m tpudet.cli.benchmark --preset coco_panoptic_r50_fpn --mode infer --batch-size 16 --iters 10
run python -m tpudet.cli.benchmark --preset coco_panoptic_r50_fpn --mode train --batch-size 8 --iters 8

# 13. DETR family on the real chip: R50 COCO preset (single-scale C5 ->
#     1092-token encoder at 1344px, 6+6 layers, 100 queries — the MXU
#     attention path none of the conv families touch). Infer b=16 +
#     train b=8 (training adds the in-jit Hungarian matching + aux losses).
run python -m tpudet.cli.benchmark --preset coco_detr_r50 --mode infer --batch-size 16 --iters 10
run python -m tpudet.cli.benchmark --preset coco_detr_r50 --mode train --batch-size 8 --iters 8
