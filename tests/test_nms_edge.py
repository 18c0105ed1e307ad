"""Regression: max_outputs larger than the candidate count (found driving a
64x64-canvas ResNet-50 predict: 144 anchors vs post_nms_topk=300)."""

import numpy as np
import jax.numpy as jnp

from tpudet.ops.nms import nms
from tpudet.kernels.nms import nms_pallas
from tests.test_boxes import random_boxes


def test_max_outputs_exceeds_n():
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(random_boxes(rng, 10))
    scores = jnp.asarray(rng.uniform(0, 1, 10).astype(np.float32))
    for fn, kw in [(nms, {}), (nms_pallas, {"interpret": True})]:
        idx, valid = fn(boxes, scores, 0.99, 300, **kw)
        assert idx.shape == (300,) and valid.shape == (300,)
        v = np.asarray(valid)
        assert v.sum() == 10  # all kept (threshold ~1)
        assert not v[10:].any()
