import numpy as np
import jax.numpy as jnp
import pytest

from tpudet.ops import nms as N
from tests import oracles
from tests.test_boxes import random_boxes


def run_nms(boxes, scores, thresh, max_out, **kw):
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out, **kw)
    idx, valid = np.asarray(idx), np.asarray(valid)
    return list(idx[valid])


def test_nms_matches_oracle(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 60, size=50.0)
        scores = rng.uniform(0, 1, 60).astype(np.float32)
        for thresh in [0.3, 0.5, 0.7]:
            got = run_nms(boxes, scores, thresh, 20)
            want = oracles.np_nms(boxes, scores, thresh, 20)
            assert got == want, f"trial={trial} thresh={thresh}"


def test_nms_score_ordering():
    boxes = np.asarray(
        [[0, 0, 10, 10], [100, 100, 110, 110], [0.5, 0.5, 10.5, 10.5]],
        dtype=np.float32,
    )
    scores = np.asarray([0.5, 0.9, 0.8], dtype=np.float32)
    # Box 2 (0.8) suppresses box 0 (0.5, IoU~0.82); box 1 unrelated.
    assert run_nms(boxes, scores, 0.5, 3) == [1, 2]


def test_nms_tie_prefers_lower_index():
    boxes = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32)
    scores = np.asarray([0.7, 0.7], dtype=np.float32)
    assert run_nms(boxes, scores, 0.5, 2) == [0, 1]


def test_nms_valid_mask_excludes():
    boxes = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32)
    scores = np.asarray([0.9, 0.8], dtype=np.float32)
    keep = run_nms(
        boxes, scores, 0.5, 2, valid_mask=jnp.asarray([False, True])
    )
    assert keep == [1]


def test_nms_score_threshold():
    boxes = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float32)
    scores = np.asarray([0.9, 0.01], dtype=np.float32)
    assert run_nms(boxes, scores, 0.5, 2, score_threshold=0.05) == [0]


def test_nms_tf_parity(rng):
    """Selection parity with tf.image.non_max_suppression (SURVEY.md §4.2)."""
    tf = pytest.importorskip("tensorflow")
    boxes = random_boxes(rng, 100, size=80.0)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    # TF takes [y1, x1, y2, x2]; IoU is permutation-invariant per-box, so swap.
    tf_boxes = boxes[:, [1, 0, 3, 2]]
    for thresh in [0.4, 0.6]:
        want = tf.image.non_max_suppression(
            tf_boxes, scores, max_output_size=30, iou_threshold=thresh
        ).numpy().tolist()
        got = run_nms(boxes, scores, thresh, 30)
        assert got == want


def test_batched_nms_separates_classes():
    # Identical boxes, different classes: no cross-class suppression.
    boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    scores = np.asarray([0.9, 0.8], dtype=np.float32)
    classes = jnp.asarray([0, 1])
    idx, valid = N.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), classes, 0.5, 2
    )
    assert list(np.asarray(idx)[np.asarray(valid)]) == [0, 1]
    # Same class: suppression applies.
    idx, valid = N.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 0]), 0.5, 2
    )
    assert list(np.asarray(idx)[np.asarray(valid)]) == [0]


def test_batched_nms_offset_preserves_f32_resolution():
    """The class-coordinate offset must keep sub-pixel f32 resolution for
    high class ids: two near-threshold boxes in class 80 must resolve
    exactly as they do in class 1 (a 1e5 offset puts class-80 boxes at
    ~8e6 where f32 spacing is 0.5 px and flips the comparison)."""
    from tpudet.ops.nms import batched_nms, nms

    # IoU just over 0.5: suppression expected.
    base = np.asarray([[0.0, 0.0, 100.0, 100.0],
                       [0.0, 33.0, 100.0, 133.0]], np.float32)
    scores = np.asarray([0.9, 0.8], np.float32)
    ref_idx, ref_valid = nms(jnp.asarray(base), jnp.asarray(scores), 0.5, 2)
    for cls in (1, 80):
        ids = np.full(2, cls, np.int32)
        idx, valid = batched_nms(jnp.asarray(base), jnp.asarray(scores),
                                 jnp.asarray(ids), 0.5, 2)
        np.testing.assert_array_equal(np.asarray(valid),
                                      np.asarray(ref_valid), err_msg=str(cls))
        np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)],
                                      np.asarray(ref_idx)[np.asarray(ref_valid)])


def test_coordinate_offset_for_scales_with_canvas():
    """ADVICE r1: the class-offset stride must exceed the max coordinate —
    large-imagery canvases (> 4096) must get a larger band automatically."""
    from tpudet.ops.nms import coordinate_offset_for

    assert coordinate_offset_for(1344.0) == 4096.0
    assert coordinate_offset_for(4095.9) == 4096.0
    assert coordinate_offset_for(4096.0) == 8192.0
    assert coordinate_offset_for(10000.0) == 16384.0

    # Model-level derivation picks up aspect-bucket canvases too.
    from tpudet.config import Config, DataConfig
    from tpudet.models.faster_rcnn import _nms_offset

    cfg = Config(data=DataConfig(canvas_height=1024, canvas_width=1024,
                                 aspect_buckets=((640, 5000), (5000, 640))))
    assert _nms_offset(cfg) == 8192.0
