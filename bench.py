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
import os
import subprocess
import sys
import time

# Generous first window: a fresh process through the remote-compile tunnel
# takes ~7 min to compile the full model; steady-state iters are fast.
ATTEMPT_TIMEOUTS_S = (12 * 60, 8 * 60)
RETRY_PAUSE_S = 90

# Last known-good measurement, updated on every successful run and attached
# (clearly labeled, never substituting "value") when every attempt fails —
# so a wedged-tunnel round still records "framework last measured X at
# commit Y" vs "framework regressed" (VERDICT r2 weak #1).
LAST_GOOD_PATH = os.environ.get(
    "TPUDET_BENCH_LAST_GOOD",
    os.path.join(os.path.dirname(__file__), "BENCH_LAST_GOOD.json"),
)


def _read_last_good():
    try:
        with open(LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001 — missing/corrupt file is "no record"
        return None


def _write_last_good(line: dict):
    rec = {
        "value": line.get("value"),
        "unit": line.get("unit"),
        "nms_kernel_us_per_img": line.get("nms_kernel_us_per_img"),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    try:
        rec["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(__file__) or ".",
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        rec["commit"] = None
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(rec, f)
            f.write("\n")
    except OSError:
        pass


def inner():
    if os.environ.get("TPUDET_BENCH_SIMULATE_WEDGE"):
        # Test hook: behave exactly like a wedged tunnel (hang forever)
        # WITHOUT creating a TPU client — lets the failure artifact be
        # tested while a real measurement holds the chip.
        time.sleep(3600)

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

    # Test hook: TPUDET_BENCH_TIMEOUTS="2,2" shrinks the attempt windows so
    # the wedge path is testable without waiting 20 minutes.
    timeouts = ATTEMPT_TIMEOUTS_S
    retry_pause = RETRY_PAUSE_S
    if os.environ.get("TPUDET_BENCH_TIMEOUTS"):
        timeouts = tuple(
            float(t) for t in os.environ["TPUDET_BENCH_TIMEOUTS"].split(",")
        )
        retry_pause = float(os.environ.get("TPUDET_BENCH_RETRY_PAUSE", "1"))

    last_rc = 1
    for i, timeout_s in enumerate(timeouts):
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
            if i + 1 < len(timeouts):
                time.sleep(retry_pause)  # tunnel recovery window
            continue
        # Forward the child's JSON line (the last stdout line starting with
        # "{" — NOT rfind("{"), which would slice mid-line whenever the
        # JSON itself contains a brace, e.g. an XLA layout string inside
        # nms_error).
        if proc.returncode == 0 and out.strip():
            json_lines = [
                ln for ln in out.splitlines() if ln.startswith("{")
            ]
            line = json_lines[-1] if json_lines else out
            try:
                parsed = json.loads(line)
                if parsed.get("value") is not None:
                    _write_last_good(parsed)
            except (json.JSONDecodeError, AttributeError):
                pass
            sys.stdout.write(line + "\n")
            return 0
        last_rc = proc.returncode or 1
        print(
            f"bench attempt {i + 1} exited rc={proc.returncode} "
            f"with output: {out.strip()[:200]!r}",
            file=sys.stderr,
        )
        if i + 1 < len(timeouts):
            time.sleep(retry_pause)
    # Total failure (e.g. the TPU tunnel wedged through every attempt):
    # still emit the one JSON line so the round's bench artifact records
    # WHY there is no number instead of being empty.
    failure = {
        "metric": "images_per_sec_per_chip",
        "value": None,
        "unit": "img/s",
        "vs_baseline": None,
        "error": "all bench attempts failed or hung (wedged TPU tunnel?)",
    }
    # Attach the last known-good number (clearly labeled as historical —
    # value stays null) so the artifact distinguishes "environment down"
    # from "framework regressed".
    last_good = _read_last_good()
    if last_good is not None:
        failure["last_good"] = last_good
    print(json.dumps(failure))
    return last_rc


if __name__ == "__main__":
    sys.exit(main())
