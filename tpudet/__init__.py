"""tpudet — TPU-native 2D object detection (JAX/XLA/Pallas/pjit).

A brand-new framework with the capabilities of the TF2 Faster R-CNN reference
(``antoineBarbez/2D_object_detection``), designed TPU-first: static shapes,
jit-compiled train/eval steps, data-parallel sharding over a device mesh, and
Pallas kernels for the proposal/NMS/RoI hot path. See SURVEY.md for the
component inventory this implements.
"""

import os as _os

# Platform pin: ``TPUDET_PLATFORM=cpu python ...`` forces the backend for
# ANY process that imports tpudet (CLIs, ad-hoc scripts, notebooks). Needed
# because some environments (e.g. an axon sitecustomize) register a TPU
# plugin and pin JAX_PLATFORMS at interpreter start, overriding the env var
# a user sets on the command line; jax backends initialize lazily, so
# re-pointing jax.config here — before any array op — still takes effect.
# Keeps CPU-side jobs (learning proofs, smoke runs) from silently becoming
# TPU clients. cli/common.py applies the same pin for CLI entry points that
# import it before tpudet; both are idempotent.
_plat = _os.environ.get("TPUDET_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

from tpudet.config import Config, tiny_test_config  # noqa: F401

__version__ = "0.1.0"
