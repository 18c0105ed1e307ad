"""bench.py failure-artifact tests (VERDICT r2 weak #1): a run whose every
attempt hangs must still emit one JSON line that records BOTH the failure
and the last known-good measurement — so a wedged-tunnel round is
distinguishable from a regression. Uses the TPUDET_BENCH_SIMULATE_WEDGE
hook, which hangs the child BEFORE any jax import (no TPU client is ever
created, so this is safe to run while a real measurement holds the chip)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_wedged(tmp_path, with_last_good: bool):
    lg_path = str(tmp_path / "last_good.json")
    if with_last_good:
        with open(lg_path, "w") as f:
            json.dump({"value": 802.19, "unit": "images/sec",
                       "timestamp": "2026-08-19T00:00:00Z",
                       "commit": "deadbee"}, f)
    env = dict(
        os.environ,
        TPUDET_BENCH_SIMULATE_WEDGE="1",
        TPUDET_BENCH_TIMEOUTS="2,1",
        TPUDET_BENCH_RETRY_PAUSE="0",
        TPUDET_BENCH_LAST_GOOD=lg_path,
    )
    out = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=120,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, out.stdout + out.stderr
    return json.loads(lines[-1]), out.stderr


def test_wedged_run_records_failure_and_last_good(tmp_path):
    artifact, stderr = _run_wedged(tmp_path, with_last_good=True)
    # The primary value must be null (never substituted by history) ...
    assert artifact["value"] is None
    assert artifact["vs_baseline"] is None
    assert "hung" in artifact["error"] or "failed" in artifact["error"]
    # ... and the historical record must ride along, clearly labeled.
    assert artifact["last_good"]["value"] == 802.19
    assert artifact["last_good"]["commit"] == "deadbee"
    assert "hung" in stderr  # both attempts were killed


def test_wedged_run_without_history_omits_last_good(tmp_path):
    artifact, _ = _run_wedged(tmp_path, with_last_good=False)
    assert artifact["value"] is None
    assert "last_good" not in artifact
