"""Mesh construction and sharding helpers.

Design (scaling-book recipe): pick a mesh, annotate shardings on the step's
inputs/outputs, and let XLA insert the collectives. For the detection
workload the canonical layout is a 1-D 'data' axis (batch-sharded inputs,
replicated params → psum of grads over ICI). A 'model' axis is kept in the
mesh shape so tensor-parallel experiments are a PartitionSpec edit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int = -1,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. ``num_data=-1`` → all devices / model."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    n = num_data * num_model
    if n > len(devices):
        raise ValueError(
            f"mesh {num_data}x{num_model} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree on the mesh, batch axis over 'data'.

    Per-leaf: dim-0 sharded on 'data', everything else replicated. The
    data-axis size must divide the global batch size (dim 0 of every leaf).
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
