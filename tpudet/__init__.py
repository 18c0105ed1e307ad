"""tpudet — TPU-native 2D object detection (JAX/XLA/Pallas/pjit).

A brand-new framework with the capabilities of the TF2 Faster R-CNN reference
(``antoineBarbez/2D_object_detection``), designed TPU-first: static shapes,
jit-compiled train/eval steps, data-parallel sharding over a device mesh, and
Pallas kernels for the proposal/NMS/RoI hot path. See SURVEY.md for the
component inventory this implements.
"""

from tpudet.config import Config, tiny_test_config  # noqa: F401

__version__ = "0.1.0"
