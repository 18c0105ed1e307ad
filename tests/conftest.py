"""Test harness with two tiers (SURVEY.md §4 items 3–4):

Default tier — run everything on CPU with 8 fake devices so mesh/sharding
semantics (pjit, psum over 'data') are exercised without a TPU pod. Pallas
kernels run in interpret mode here.

TPU tier — ``TPUDET_TEST_TPU=1 pytest -m tpu`` keeps the real backend (the
single v5e chip in this environment) and runs only the ``tpu``-marked tests:
Pallas kernels at real shapes compiled through Mosaic, plus a full predict /
train step on the flagship config. Interpret-mode tests cannot see
Mosaic/runtime behavior (a ragged-shape NMS call once crashed the TPU worker
while every interpret test was green), hence this tier.

Note: this environment's sitecustomize imports jax and pins the platform to
the 'axon' TPU plugin at interpreter start; backends initialize lazily, so
re-pointing jax.config at CPU here (before any array op) still works —
setting JAX_PLATFORMS via os.environ would be too late."""

import os

import numpy as np
import pytest

TPU_MODE = os.environ.get("TPUDET_TEST_TPU") == "1"

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


if TPU_MODE:
    # Per-test on-hardware provenance (VERDICT r2 weak #5): every tpu-tier
    # test APPENDS one JSON line {test, outcome, commit, date, duration_s}
    # to a checked-in log as it finishes — so "what is proven on hardware,
    # at which commit" survives a tunnel wedge mid-run and is auditable
    # across rounds. Appended incrementally, never rewritten.
    import json as _json
    import subprocess as _sp
    import time as _time

    _PROV_PATH = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TPU_PROVENANCE.jsonl",
    )
    try:
        _COMMIT = _sp.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(_PROV_PATH),
        ).stdout.strip() or None
        # Dirty-tree flag (round-3 advisor): a provenance entry taken from
        # an uncommitted working tree must be distinguishable — otherwise
        # the log can cite commits that don't contain the code that ran.
        # The provenance logs themselves append mid-session; their own
        # dirtiness says nothing about the code.
        _status = _sp.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(_PROV_PATH),
        ).stdout
        _DIRTY = any(
            not line.rstrip().endswith("PROVENANCE.jsonl")
            for line in _status.splitlines() if line.strip()
        )
    except Exception:  # noqa: BLE001
        _COMMIT = None
        _DIRTY = None

    def pytest_runtest_logreport(report):
        if report.when != "call":
            return
        rec = {
            "test": report.nodeid,
            "outcome": report.outcome,
            "commit": _COMMIT,
            "dirty": _DIRTY,
            "date": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
            "duration_s": round(report.duration, 1),
        }
        try:
            with open(_PROV_PATH, "a") as f:
                f.write(_json.dumps(rec) + "\n")
        except OSError:
            pass


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        skip = pytest.mark.skip(
            reason="TPU mode (TPUDET_TEST_TPU=1) runs only tpu-marked tests; "
            "the CPU-tier tests assume the 8-fake-device CPU mesh"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs the real TPU: run TPUDET_TEST_TPU=1 pytest -m tpu"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
