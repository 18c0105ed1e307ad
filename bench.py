#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures batched Faster R-CNN inference throughput (BASELINE config 3:
b=32, ResNet-50, VOC-class head) on whatever accelerator is present,
against the north-star 1500 images/sec target (v5e-8).

The measurement runs in a CHILD process with a timeout + one retry: this
environment's axon TPU tunnel intermittently wedges (every device RPC
blocks forever, observed recovery after killing clients and waiting), so a
hung attempt must not turn the round's bench artifact into an empty
timeout — a fresh process after a pause is the documented recovery
procedure (.claude/skills/verify)."""

import json
import subprocess
import sys
import time

# Generous first window: a fresh process through the remote-compile tunnel
# takes ~7 min to compile the full model; steady-state iters are fast.
ATTEMPT_TIMEOUTS_S = (12 * 60, 8 * 60)
RETRY_PAUSE_S = 90


def inner():
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


def main():
    if "--inner" in sys.argv:
        return inner()

    last_rc = 1
    for i, timeout_s in enumerate(ATTEMPT_TIMEOUTS_S):
        proc = subprocess.Popen(
            [sys.executable, __file__, "--inner"],
            stdout=subprocess.PIPE,
            text=True,
        )
        try:
            out, _ = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print(
                f"bench attempt {i + 1} hung past {timeout_s}s "
                "(wedged TPU tunnel?) — killed",
                file=sys.stderr,
            )
            if i + 1 < len(ATTEMPT_TIMEOUTS_S):
                time.sleep(RETRY_PAUSE_S)  # tunnel recovery window
            continue
        # Forward the child's JSON line (the last stdout line starting with
        # "{" — NOT rfind("{"), which would slice mid-line whenever the
        # JSON itself contains a brace, e.g. an XLA layout string inside
        # nms_error).
        if proc.returncode == 0 and out.strip():
            json_lines = [
                ln for ln in out.splitlines() if ln.startswith("{")
            ]
            sys.stdout.write((json_lines[-1] if json_lines else out) + "\n")
            return 0
        last_rc = proc.returncode or 1
        print(
            f"bench attempt {i + 1} exited rc={proc.returncode} "
            f"with output: {out.strip()[:200]!r}",
            file=sys.stderr,
        )
        if i + 1 < len(ATTEMPT_TIMEOUTS_S):
            time.sleep(RETRY_PAUSE_S)
    # Total failure (e.g. the TPU tunnel wedged through every attempt):
    # still emit the one JSON line so the round's bench artifact records
    # WHY there is no number instead of being empty.
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": None,
        "unit": "img/s",
        "vs_baseline": None,
        "error": "all bench attempts failed or hung (wedged TPU tunnel?)",
    }))
    return last_rc


if __name__ == "__main__":
    sys.exit(main())
