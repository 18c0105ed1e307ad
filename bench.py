#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures batched Faster R-CNN inference throughput (BASELINE config 3:
b=32, ResNet-50, VOC-class head) on whatever accelerator is present,
against the north-star 1500 images/sec target (v5e-8)."""

import json
import sys


def main():
    import dataclasses

    from tpudet.cli.benchmark import bench_infer
    from tpudet.cli.common import preset_config

    cfg = preset_config("voc_r50")
    # bf16 compute path for inference (standard TPU practice; params f32).
    cfg = cfg.replace(
        backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16")
    )
    # Synthetic input (no datasets in this environment) at the VOC canvas.
    result = bench_infer(cfg, batch_size=32, iters=10)
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    # Secondary tracked metric (BASELINE.json "NMS Pallas kernel us/img"):
    # measured at proposal-generation shape; reported in the same JSON line
    # so the driver history records it every round.
    try:
        from tpudet.cli.benchmark import bench_nms

        nms = bench_nms(cfg, iters=5)
        line["nms_kernel_us_per_img"] = nms["value"]
    except Exception as e:  # noqa: BLE001 — secondary metric must not
        line["nms_kernel_us_per_img"] = None  # sink the primary number
        line["nms_error"] = f"{type(e).__name__}: {e}"[:120]
    print(json.dumps(line))


if __name__ == "__main__":
    sys.exit(main())
