import numpy as np
import jax.numpy as jnp

from tpudet.ops import matchers as M
from tpudet.ops import boxes as B
from tests import oracles
from tests.test_boxes import random_boxes


def test_match_matches_oracle_rpn(rng):
    anchors = random_boxes(rng, 40)
    gt = random_boxes(rng, 5)
    iou = np.asarray(B.pairwise_iou(jnp.asarray(anchors), jnp.asarray(gt)))
    got_idx, got_lab = M.match_boxes(
        jnp.asarray(iou), 0.7, 0.3, allow_low_quality=True
    )
    want_idx, want_lab = oracles.np_match(iou, 0.7, 0.3, allow_low_quality=True)
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_match_matches_oracle_detection(rng):
    props = random_boxes(rng, 40)
    gt = random_boxes(rng, 5)
    iou = np.asarray(B.pairwise_iou(jnp.asarray(props), jnp.asarray(gt)))
    got_idx, got_lab = M.match_boxes(
        jnp.asarray(iou), 0.5, 0.5, allow_low_quality=False, bg_thresh_lo=0.1
    )
    want_idx, want_lab = oracles.np_match(
        iou, 0.5, 0.5, allow_low_quality=False, bg_lo=0.1
    )
    np.testing.assert_array_equal(np.asarray(got_lab), want_lab)


def test_match_thresholds_handbuilt():
    # anchor0 IoU .8 with gt0 -> pos; anchor1 IoU .5 -> ignore; anchor2 .1 -> neg
    iou = jnp.asarray([[0.8, 0.0], [0.5, 0.0], [0.1, 0.05]])
    idx, lab = M.match_boxes(iou, 0.7, 0.3)
    np.testing.assert_array_equal(np.asarray(lab), [1, -1, 0])
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0])


def test_low_quality_rescues_best_anchor():
    # No anchor reaches 0.7 for gt1, but anchor1 is its argmax -> positive.
    iou = jnp.asarray([[0.8, 0.1], [0.2, 0.45]])
    _, lab = M.match_boxes(iou, 0.7, 0.3, allow_low_quality=True)
    np.testing.assert_array_equal(np.asarray(lab), [1, 1])
    _, lab = M.match_boxes(iou, 0.7, 0.3, allow_low_quality=False)
    np.testing.assert_array_equal(np.asarray(lab), [1, -1])


def test_gt_validity_mask():
    # gt1 invalid: anchor best-matching it must not become positive.
    iou = jnp.asarray([[0.1, 0.9], [0.8, 0.0]])
    idx, lab = M.match_boxes(
        iou, 0.7, 0.3, gt_valid=jnp.asarray([True, False]), allow_low_quality=True
    )
    np.testing.assert_array_equal(np.asarray(lab), [0, 1])
    assert int(idx[1]) == 0


def test_no_valid_gt_all_negative():
    iou = jnp.asarray([[0.9], [0.5]])
    _, lab = M.match_boxes(
        iou, 0.7, 0.3, gt_valid=jnp.asarray([False]), allow_low_quality=True
    )
    np.testing.assert_array_equal(np.asarray(lab), [0, 0])
