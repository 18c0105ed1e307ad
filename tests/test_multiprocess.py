"""Multi-process pod integration test (VERDICT r2 item 9; SURVEY.md §2
multi-host input sharding, BASELINE configs 4-5 pod-scale training).

Everything multi-host in the library is elsewhere tested single-process
with ``process_index``/``process_count`` faked. This test de-risks the real
thing: TWO separate OS processes join a ``jax.distributed`` cluster on CPU
(gloo collectives, 4 fake devices each -> one 8-device dp mesh split 2x4)
and run the actual production path:

  * loader lockstep — every process derives the identical global bucketed
    batch plan (canvas sequence + batch count) and loads disjoint strided
    rows; a desync here is a collective hang on a real pod;
  * a sharded train step over the global mesh (global batch assembled via
    ``jax.make_array_from_process_local_data``), loss identical on both
    processes (it is a data-psum'd global scalar);
  * a coordinated orbax save, then a FULL process restart (fresh cluster,
    new PIDs) restoring the checkpoint — step counter and a parameter
    fingerprint must survive.

The workers live in tests/_mp_worker.py; their in-process assertions fail
the subprocess, which fails this test with both workers' output attached.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_phase(phase: str, ckpt: str, nproc: int = 2, timeout: int = 420):
    """Spawn nproc real workers for one phase; return their MPRESULT dicts
    ordered by process id."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # The workers pin themselves to CPU + 4 fake devices internally; drop
    # any inherited force-host count so this test composes with the
    # 8-device default tier env.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    # The package is run from the source tree (not installed): script-mode
    # python sets sys.path[0] to tests/, so the repo root must come via
    # PYTHONPATH for the workers to import tpudet.
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, "--coord", coord, "--pid", str(i),
             "--nproc", str(nproc), "--ckpt", ckpt, "--phase", phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_REPO,
        )
        for i in range(nproc)
    ]
    outs, rcs = [], []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            rcs.append(p.returncode)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    blob = "\n".join(
        f"--- worker {i} (rc={rcs[i] if i < len(rcs) else '?'}) ---\n{o}"
        for i, o in enumerate(outs)
    )
    assert all(rc == 0 for rc in rcs), blob
    results = []
    for i, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("MPRESULT ")]
        assert lines, f"worker {i} emitted no MPRESULT:\n{blob}"
        results.append(json.loads(lines[-1][len("MPRESULT "):]))
    results.sort(key=lambda r: r["pid"])
    return results


def test_two_process_pod_train_save_restore(tmp_path):
    ckpt = str(tmp_path / "ckpt")

    train = _run_phase("train", ckpt)
    assert [r["pid"] for r in train] == [0, 1]
    # Both processes agree on everything global: plan size, losses (the
    # workers already assert bitwise-equal via allgather; cross-check the
    # reported values here), final step, and the parameter fingerprint.
    assert train[0]["num_batches_planned"] == train[1]["num_batches_planned"]
    assert train[0]["losses"] == train[1]["losses"]
    assert train[0]["step"] == train[1]["step"] == 2
    assert train[0]["fingerprint"] == pytest.approx(
        train[1]["fingerprint"], rel=0, abs=0)

    # Full restart: fresh cluster, differently-seeded init, restore.
    resume = _run_phase("resume", ckpt)
    for r in resume:
        assert r["step"] == 2, r
        assert r["fingerprint"] == pytest.approx(
            train[0]["fingerprint"], rel=1e-6), (r, train[0])
