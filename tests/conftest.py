"""Test harness: run everything on CPU with 8 fake devices so mesh/sharding
semantics (pjit, psum over 'data') are exercised without a TPU pod
(SURVEY.md §4 item 4).

Note: this environment's sitecustomize imports jax and pins the platform to
the 'axon' TPU plugin at interpreter start; backends initialize lazily, so
re-pointing jax.config at CPU here (before any array op) still works —
setting JAX_PLATFORMS via os.environ would be too late."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
