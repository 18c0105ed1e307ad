"""Worker process for the 2-process pod integration test
(tests/test_multiprocess.py — VERDICT r2 item 9).

Each worker is a REAL separate process that joins a jax.distributed
cluster on CPU (gloo collectives, 4 fake devices per process -> 8 global
devices split 2x4), then:

  phase=train : builds the bucketed multi-host loader, asserts plan
                lockstep across processes via process_allgather, runs two
                sharded train steps on a dp8 mesh, saves an orbax
                checkpoint (multi-process coordinated save).
  phase=resume: fresh cluster (simulating a job restart), restores the
                checkpoint into a differently-seeded state, verifies the
                step counter and parameter fingerprint survive.

Emits one final JSON line ``MPRESULT {...}`` on stdout that the test
parses; assertions inside the worker fail the subprocess (non-zero exit),
which fails the test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _setup_jax(coord: str, pid: int, nproc: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    # Same trick as tests/conftest.py: the axon sitecustomize pins the
    # platform at interpreter start, but backends initialize lazily, so
    # re-pointing at CPU before any array op keeps this worker off the TPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    return jax


def _build(jax):
    """Shared model/config/mesh construction (both phases)."""
    from dataclasses import replace

    from tpudet.config import tiny_test_config
    from tpudet.models import build_model
    from tpudet.parallel import batch_sharding, make_mesh
    from tpudet.train.state import create_train_state

    cfg = tiny_test_config()
    # Two aspect buckets so the GLOBAL bucket plan is nontrivial — the
    # lockstep property under test is that every process derives the same
    # batch count and canvas sequence (desync here = a collective hang on
    # a real pod).
    cfg = cfg.replace(data=replace(
        cfg.data, aspect_buckets=((64, 64), (64, 96)),
        min_size=64, max_size=96))
    mesh = make_mesh(num_data=jax.device_count())
    sharding = batch_sharding(mesh)
    model = build_model(cfg)
    # Different per-phase seeds are applied by the callers; params are
    # restored in the resume phase, so the init seed must NOT matter there.
    return cfg, mesh, sharding, model, create_train_state


def _mixed_dataset():
    import numpy as np

    from tpudet.data.synthetic import SyntheticDataset

    # 36 examples / global batch 8 / every third wide: 12 wide -> one full
    # wide batch, 24 square -> three; both buckets survive drop_last.
    base = SyntheticDataset(num_classes=3, num_examples=36, image_size=64)

    class MixedHW:
        """Every third image widened to 64x96 -> the second bucket."""

        def __init__(self, b):
            self.base = b

        def __len__(self):
            return len(self.base)

        def get_example(self, i):
            ex = self.base.get_example(i)
            if i % 3 == 0:
                img = ex["image"]
                ex = dict(ex, image=np.concatenate([img, img[:, :32]], 1))
            return ex

        def example_hw(self, i):
            return (64, 96) if i % 3 == 0 else (64, 64)

    return MixedHW(base)


def _param_fingerprint(jax, state):
    """Global L2 norm over all params — a scalar fingerprint that is
    identical across processes iff the (replicated) params are."""
    import jax.numpy as jnp

    sq = sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree_util.tree_leaves(state.params)
    )
    return float(jax.device_get(jnp.sqrt(sq)))


def run_train(jax, ckpt_dir: str) -> dict:
    import numpy as np
    from jax.experimental import multihost_utils

    from tpudet.data import DataLoader
    from tpudet.train.checkpoint import CheckpointManager
    from tpudet.train.step import make_train_step

    cfg, mesh, sharding, model, create_train_state = _build(jax)
    ds = _mixed_dataset()
    loader = DataLoader(cfg, ds, batch_size=8, shuffle=True, seed=3,
                        num_workers=2, sharding=sharding)

    # --- loader lockstep: every process must plan the same epoch ---------
    plan = loader._epoch_batch_indices(0)
    canvases = np.asarray(
        [ds.example_hw(int(idx[0]))[1] for idx, _ in plan], np.int32
    )
    gathered = multihost_utils.process_allgather(canvases)  # [nproc, nbatch]
    assert (gathered == gathered[0]).all(), (
        "bucket plan desynchronized across processes:\n" + str(gathered)
    )
    assert len({int(c) for c in canvases}) == 2, canvases  # both buckets hit
    # Rows must be disjoint across processes (each loads its strided slice).
    rows = np.asarray([idx for idx, _ in plan], np.int64)  # [nbatch, 4]
    rows_all = multihost_utils.process_allgather(rows)     # [nproc, nbatch, 4]
    for b in range(rows_all.shape[1]):
        r0, r1 = set(rows_all[0, b].tolist()), set(rows_all[1, b].tolist())
        assert not (r0 & r1), (b, r0, r1)

    # --- two sharded train steps on the dp8 mesh -------------------------
    # Create the state INSIDE jit with a replicated out_sharding: plain
    # device_put cannot target a global (non-addressable) sharding across
    # processes, but a jitted init is deterministic from the key, so every
    # process computes identical replicated shards.
    state = jax.jit(
        lambda: create_train_state(model, cfg.train, jax.random.key(0)),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()),
    )()
    step = make_train_step(model, cfg, mesh=mesh)

    stream = loader.device_stream()
    losses = []
    for _ in range(2):
        batch = next(stream)
        assert batch["image"].shape[0] == 8  # GLOBAL batch assembled
        state, metrics = step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    del stream
    # The loss is a global (data-psum'd) scalar: identical on every process.
    loss_all = multihost_utils.process_allgather(
        np.asarray(losses, np.float32))
    assert np.allclose(loss_all, loss_all[0], rtol=0, atol=0), loss_all

    # --- coordinated orbax save ------------------------------------------
    mgr = CheckpointManager(ckpt_dir, keep=2)
    assert mgr.save(state, force=True)
    mgr.wait()
    mgr.close()

    return {
        "phase": "train",
        "step": int(jax.device_get(state.step)),
        "losses": losses,
        "fingerprint": _param_fingerprint(jax, state),
        "num_batches_planned": len(plan),
    }


def run_resume(jax, ckpt_dir: str) -> dict:
    from tpudet.train.checkpoint import CheckpointManager

    cfg, mesh, sharding, model, create_train_state = _build(jax)
    # Different init seed: restore must overwrite every param. Jitted init
    # with a replicated out_sharding (see run_train for why not device_put).
    state = jax.jit(
        lambda: create_train_state(model, cfg.train, jax.random.key(99)),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()),
    )()
    mgr = CheckpointManager(ckpt_dir, keep=2)
    restored = mgr.restore(state)
    mgr.close()
    return {
        "phase": "resume",
        "step": int(jax.device_get(restored.step)),
        "fingerprint": _param_fingerprint(jax, restored),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coord", required=True)
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--phase", choices=["train", "resume"], required=True)
    args = p.parse_args()

    jax = _setup_jax(args.coord, args.pid, args.nproc)
    out = (run_train if args.phase == "train" else run_resume)(
        jax, args.ckpt)
    out["pid"] = args.pid
    print("MPRESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
