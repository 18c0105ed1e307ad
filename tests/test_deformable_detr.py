"""Deformable DETR family tests (arXiv:2010.04159): the deformable-attention
sampling op vs a numpy oracle, the focal set loss, canvas-bucket invariance,
box refinement, and the standard family contract (shapes, training, mesh,
CLI, serving)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_deformable_detr_config
from tpudet.models import DeformableDETR, build_model
from tpudet.ops.deform_attn import (
    inverse_sigmoid,
    level_reference_points,
    ms_deform_attn,
    sampling_offset_init_bias,
)
from tpudet.train.losses import deformable_detr_set_loss


def make_batch(cfg, batch_size=2, seed=0):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=cfg.data.canvas_height, seed=seed,
    )
    raw = next(iter(DataLoader(cfg, ds, batch_size, shuffle=False).batches(0)))
    return device_preprocess(cfg, {k: jnp.asarray(v) for k, v in raw.items()})


# --------------------------------------------------------------------- op


def _oracle_ms_deform_attn(values, level_shapes, locations, weights):
    """Loop-based numpy reference: grid_sample(align_corners=False,
    padding_mode='zeros') bilinear sampling, per (query, head, level,
    point), then the attention-weighted sum."""
    q, h, l, p, _ = locations.shape
    n, heads, d = values.shape
    offsets = np.cumsum([0] + [hl * wl for hl, wl in level_shapes])[:-1]
    out = np.zeros((q, h, d), np.float64)
    for qi in range(q):
        for hi in range(h):
            for li, (hl, wl) in enumerate(level_shapes):
                vmap_l = values[
                    offsets[li]:offsets[li] + hl * wl, hi
                ].reshape(hl, wl, d)
                for pi in range(p):
                    x = locations[qi, hi, li, pi, 0] * wl - 0.5
                    y = locations[qi, hi, li, pi, 1] * hl - 0.5
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    fx, fy = x - x0, y - y0
                    acc = np.zeros(d)
                    for dy, wy in ((0, 1 - fy), (1, fy)):
                        for dx, wx in ((0, 1 - fx), (1, fx)):
                            cx, cy = x0 + dx, y0 + dy
                            if 0 <= cx < wl and 0 <= cy < hl:
                                acc += wx * wy * vmap_l[cy, cx]
                    out[qi, hi] += weights[qi, hi, li, pi] * acc
    return out


def test_ms_deform_attn_matches_numpy_oracle():
    """Fuzz the fused XLA sampling against the loop oracle, with locations
    spanning in-bounds, boundary, and out-of-bounds (zero-padding) cases."""
    rng = np.random.RandomState(0)
    level_shapes = ((7, 9), (4, 5), (2, 3))
    n = sum(h * w for h, w in level_shapes)
    q, heads, p, d = 11, 2, 3, 4
    values = rng.randn(n, heads, d).astype(np.float32)
    # Locations in [-0.3, 1.3] — beyond-grid samples must contribute zero.
    locations = rng.uniform(
        -0.3, 1.3, size=(q, heads, len(level_shapes), p, 2)
    ).astype(np.float32)
    weights = rng.rand(q, heads, len(level_shapes), p).astype(np.float32)

    got = np.asarray(ms_deform_attn(
        jnp.asarray(values), level_shapes, jnp.asarray(locations),
        jnp.asarray(weights),
    ))
    want = _oracle_ms_deform_attn(values, level_shapes, locations, weights)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_batched_matches_vmap():
    """The whole-batch flat-gather formulation (the fix for the b=16
    real-chip OOM: batched gathers one-hot-expand on TPU) computes exactly
    what vmap(ms_deform_attn) computes, including when the query axis is
    chunked (query_chunk < Q forces the padded lax.map path)."""
    from tpudet.ops.deform_attn import ms_deform_attn_batched

    rng = np.random.RandomState(1)
    level_shapes = ((6, 8), (3, 4))
    n = sum(h * w for h, w in level_shapes)
    b, q, heads, p, d = 3, 13, 2, 4, 5
    values = rng.randn(b, n, heads, d).astype(np.float32)
    locations = rng.uniform(
        -0.2, 1.2, size=(b, q, heads, len(level_shapes), p, 2)
    ).astype(np.float32)
    weights = rng.rand(b, q, heads, len(level_shapes), p).astype(np.float32)

    want = np.asarray(jax.vmap(
        lambda v, l, w: ms_deform_attn(v, level_shapes, l, w)
    )(jnp.asarray(values), jnp.asarray(locations), jnp.asarray(weights)))
    for chunk in (64, 5):  # unchunked; 3 chunks with padding (13 -> 15)
        got = np.asarray(ms_deform_attn_batched(
            jnp.asarray(values), level_shapes, jnp.asarray(locations),
            jnp.asarray(weights), query_chunk=chunk,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ms_deform_attn_patch_matches_flat():
    """The patch-gather formulation (4x fewer indices, full-lane 2x2xD
    slices — the TPU gather cost model is per-index, KERNELS.md
    "Deformable attention, part 2") computes exactly what the flat form
    computes, including clamped-origin cell-weight reassignment at grid
    edges and fully out-of-grid samples, chunked and unchunked."""
    from tpudet.ops.deform_attn import (
        ms_deform_attn_batched,
        ms_deform_attn_patch,
    )

    rng = np.random.RandomState(2)
    level_shapes = ((6, 8), (3, 4), (2, 2))
    n = sum(h * w for h, w in level_shapes)
    b, q, heads, p, d = 3, 13, 2, 4, 5
    values = rng.randn(b, n, heads, d).astype(np.float32)
    # Beyond-grid and boundary samples: the clamp-shift cell weights must
    # reproduce zero-padding semantics exactly.
    locations = rng.uniform(
        -0.4, 1.4, size=(b, q, heads, len(level_shapes), p, 2)
    ).astype(np.float32)
    weights = rng.rand(b, q, heads, len(level_shapes), p).astype(np.float32)

    want = np.asarray(ms_deform_attn_batched(
        jnp.asarray(values), level_shapes, jnp.asarray(locations),
        jnp.asarray(weights),
    ))
    for chunk in (64, 5):
        got = np.asarray(ms_deform_attn_patch(
            jnp.asarray(values), level_shapes, jnp.asarray(locations),
            jnp.asarray(weights), query_chunk=chunk,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ms_deform_attn_patch_shared_locations():
    """Head-SHARED sampling locations (the config-gated 4*Hx-fewer-indices
    variant): the patch path with head-free locations must equal the flat
    path fed those locations broadcast to every head (attention weights
    stay per-head in both)."""
    from tpudet.ops.deform_attn import (
        ms_deform_attn_batched,
        ms_deform_attn_patch,
    )

    rng = np.random.RandomState(3)
    level_shapes = ((5, 7), (3, 3))
    n = sum(h * w for h, w in level_shapes)
    b, q, heads, p, d = 2, 9, 3, 2, 4
    values = rng.randn(b, n, heads, d).astype(np.float32)
    loc_shared = rng.uniform(
        -0.3, 1.3, size=(b, q, len(level_shapes), p, 2)
    ).astype(np.float32)
    weights = rng.rand(b, q, heads, len(level_shapes), p).astype(np.float32)

    want = np.asarray(ms_deform_attn_batched(
        jnp.asarray(values), level_shapes,
        jnp.asarray(np.broadcast_to(
            loc_shared[:, :, None], (b, q, heads) + loc_shared.shape[2:]
        )),
        jnp.asarray(weights),
    ))
    for chunk in (64, 4):
        got = np.asarray(ms_deform_attn_patch(
            jnp.asarray(values), level_shapes, jnp.asarray(loc_shared),
            jnp.asarray(weights), query_chunk=chunk,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ms_deform_attn_exact_center_hit():
    """A location exactly at a token center returns exactly that token."""
    level_shapes = ((4, 4),)
    values = jnp.arange(16 * 1 * 2, dtype=jnp.float32).reshape(16, 1, 2)
    # Token (row 2, col 1): center x = (1 + 0.5)/4, y = (2 + 0.5)/4.
    loc = jnp.array([[[[[1.5 / 4, 2.5 / 4]]]]])      # [1, 1, 1, 1, 2]
    w = jnp.ones((1, 1, 1, 1))
    out = ms_deform_attn(values, level_shapes, loc, w)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(values[2 * 4 + 1, 0]), rtol=1e-6
    )


def test_level_reference_points_are_token_centers():
    refs = np.asarray(level_reference_points(((2, 3), (1, 1))))
    assert refs.shape == (7, 2)
    np.testing.assert_allclose(refs[0], [0.5 / 3, 0.5 / 2])   # (x, y)
    np.testing.assert_allclose(refs[5], [2.5 / 3, 1.5 / 2])
    np.testing.assert_allclose(refs[6], [0.5, 0.5])


def test_sampling_offset_init_bias_directional():
    """Head k's init direction is 2πk/H scaled to radius p+1 (paper init):
    head 0 looks along +x, and the p-th point sits p+1 times as far."""
    h, l, p = 4, 2, 3
    bias = np.asarray(sampling_offset_init_bias(h, l, p)).reshape(h, l, p, 2)
    np.testing.assert_allclose(bias[0, 0, 0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(bias[1, 0, 0], [0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(bias[0, 1, 2], [3.0, 0.0], atol=1e-6)
    # Levels share the pattern.
    np.testing.assert_allclose(bias[:, 0], bias[:, 1])


def test_inverse_sigmoid_roundtrip():
    x = jnp.array([0.01, 0.25, 0.5, 0.9, 0.999])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x),
        rtol=1e-4,
    )


# ------------------------------------------------------------------- loss


def test_focal_set_loss_prefers_confident_query():
    """The focal matching cost must assign the GT to the query that is both
    confident in the right class and well-localized."""
    q, c = 6, 3
    logits = jnp.full((q, c), -6.0).at[4, 1].set(6.0)   # query 4: class 2
    boxes = jnp.tile(jnp.array([0.1, 0.1, 0.05, 0.05]), (q, 1)).at[4].set(
        jnp.array([0.5, 0.5, 0.2, 0.2])
    )
    gt_boxes = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    focal, l1, giou, npos = deformable_detr_set_loss(
        logits, boxes, gt_boxes, jnp.array([2], jnp.int32),
        jnp.array([True]), cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
    )
    assert float(npos) == 1.0
    assert float(l1) < 1e-6 and float(giou) < 1e-6
    # Confident negatives + a confident positive: tiny focal loss.
    assert float(focal) < 0.1


def test_focal_set_loss_padded_gt_rows_are_inert():
    """Padding GT rows in/out must not change any loss term."""
    rng = np.random.RandomState(1)
    q, c = 8, 3
    logits = jnp.asarray(rng.randn(q, c).astype(np.float32))
    boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(q, 4).astype(np.float32)))
    gt2 = jnp.asarray([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]])
    cls2 = jnp.asarray([1, 3], jnp.int32)
    kw = dict(cost_class=2.0, cost_bbox=5.0, cost_giou=2.0)
    a = deformable_detr_set_loss(
        logits, boxes, gt2, cls2, jnp.array([True, True]), **kw
    )
    gt4 = jnp.concatenate([gt2, jnp.asarray(rng.rand(2, 4), jnp.float32)])
    cls4 = jnp.concatenate([cls2, jnp.asarray([2, 2], jnp.int32)])
    b = deformable_detr_set_loss(
        logits, boxes, gt4, cls4, jnp.array([True, True, False, False]), **kw
    )
    for x, y in zip(a, b):
        assert float(x) == pytest.approx(float(y), rel=1e-5)


# ------------------------------------------------------------------ model


def test_build_model_factory_and_validation():
    cfg = tiny_deformable_detr_config()
    assert isinstance(build_model(cfg), DeformableDETR)
    with pytest.raises(ValueError, match="use_fpn"):
        DeformableDETR(cfg.replace(backbone=dataclasses.replace(
            cfg.backbone, use_fpn=True)))
    with pytest.raises(ValueError, match="num_heads"):
        DeformableDETR(cfg.replace(deformable_detr=dataclasses.replace(
            cfg.deformable_detr, num_heads=3)))
    with pytest.raises(ValueError, match="num_queries"):
        DeformableDETR(cfg.replace(deformable_detr=dataclasses.replace(
            cfg.deformable_detr, num_queries=4)))
    with pytest.raises(ValueError, match="num_levels"):
        DeformableDETR(cfg.replace(deformable_detr=dataclasses.replace(
            cfg.deformable_detr, num_levels=2)))
    with pytest.raises(ValueError, match="rpn_only"):
        DeformableDETR(cfg.replace(rpn_only=True))


def test_loss_and_predict_shapes():
    cfg = tiny_deformable_detr_config()
    m = build_model(cfg)
    v = m.init(jax.random.key(0))
    batch = make_batch(cfg)
    loss, metrics = m.loss(v, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    for k in ("focal_cls_loss", "l1_box_loss", "giou_box_loss", "num_gt"):
        assert np.isfinite(float(metrics[k])), k
    out = m.predict(v, batch)
    d = cfg.deformable_detr.max_detections
    assert out["boxes"].shape == (2, d, 4)
    assert out["scores"].shape == (2, d)
    assert out["classes"].shape == (2, d)
    # aux_loss off: total equals the single final-layer sum.
    m2 = build_model(cfg.replace(
        deformable_detr=dataclasses.replace(
            cfg.deformable_detr, aux_loss=False)
    ))
    loss2, met2 = m2.loss(v, batch, jax.random.key(1))
    dd = cfg.deformable_detr
    want = (
        dd.loss_weight_class * met2["focal_cls_loss"]
        + dd.loss_weight_bbox * met2["l1_box_loss"]
        + dd.loss_weight_giou * met2["giou_box_loss"]
    )
    assert float(loss2) == pytest.approx(float(want), rel=1e-5)


def test_patch_gather_model_parity_and_shared_variant():
    """Model-level wiring of the gather knobs: (a) sampling_gather="patch"
    produces numerically identical loss/predictions to "flat" under the
    SAME parameters (it is a formulation, not a model change); (b)
    shared_sampling_locations is a real model variant — different
    parameter shapes (head-free offsets), finite loss, standard output
    contract."""
    base = tiny_deformable_detr_config()
    cfg_patch = base.replace(deformable_detr=dataclasses.replace(
        base.deformable_detr, sampling_gather="patch"))
    m_flat, m_patch = build_model(base), build_model(cfg_patch)
    v = m_flat.init(jax.random.key(0))
    batch = make_batch(base)
    loss_f, _ = m_flat.loss(v, batch, jax.random.key(1))
    loss_p, _ = m_patch.loss(v, batch, jax.random.key(1))
    assert float(loss_f) == pytest.approx(float(loss_p), rel=1e-5)
    out_f = m_flat.predict(v, batch)
    out_p = m_patch.predict(v, batch)
    np.testing.assert_allclose(
        np.asarray(out_f["boxes"]), np.asarray(out_p["boxes"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["scores"]), np.asarray(out_p["scores"]),
        rtol=1e-4, atol=1e-5,
    )

    # "mxu" wiring: off-TPU it dispatches to the flat fallback, so the
    # result must be bit-comparable under the same params (the kernel
    # itself is equivalence-tested in tests/test_deform_attn_mxu.py and
    # on-chip in tests/test_tpu.py).
    cfg_mxu = base.replace(deformable_detr=dataclasses.replace(
        base.deformable_detr, sampling_gather="mxu"))
    m_mxu = build_model(cfg_mxu)
    loss_m, _ = m_mxu.loss(v, batch, jax.random.key(1))
    assert float(loss_m) == pytest.approx(float(loss_f), rel=1e-6)

    cfg_shared = base.replace(deformable_detr=dataclasses.replace(
        base.deformable_detr, sampling_gather="patch",
        shared_sampling_locations=True))
    m_shared = build_model(cfg_shared)
    v_s = m_shared.init(jax.random.key(0))
    off = v_s["params"]["enc0"]["deform_attn"]["sampling_offsets"]["bias"]
    dd = base.deformable_detr
    assert off.shape == (dd.num_levels * dd.num_points * 2,)
    loss_s, _ = m_shared.loss(v_s, batch, jax.random.key(1))
    assert np.isfinite(float(loss_s))
    out_s = m_shared.predict(v_s, batch)
    assert out_s["boxes"].shape == (2, dd.max_detections, 4)


def test_box_refine_variant():
    """with_box_refine: per-layer heads exist, loss finite, prediction
    shapes unchanged; parameter count strictly larger (separate heads)."""
    base = tiny_deformable_detr_config()
    cfg = base.replace(deformable_detr=dataclasses.replace(
        base.deformable_detr, with_box_refine=True))
    m0, m1 = build_model(base), build_model(cfg)
    v0, v1 = m0.init(jax.random.key(0)), m1.init(jax.random.key(0))
    n0 = sum(x.size for x in jax.tree.leaves(v0))
    n1 = sum(x.size for x in jax.tree.leaves(v1))
    assert n1 > n0
    p1 = v1["params"]
    assert "class_head1" in p1 and "bbox_head1" in p1
    batch = make_batch(cfg)
    loss, _ = m1.loss(v1, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    out = m1.predict(v1, batch)
    assert out["boxes"].shape == (2, cfg.deformable_detr.max_detections, 4)


def test_e2e_canvas_invariance():
    """END-TO-END bucket invariance: the same image + GT on two different
    canvases must produce identical losses AND decoded predictions. The
    pieces here beyond DETR's: per-level valid-ratio scaling of reference
    points and sampling locations, and value masking inside MSDeformAttn
    (a sample landing on canvas padding contributes zero, exactly like an
    out-of-grid sample — without it a bigger canvas exposes padded features
    a smaller one clips)."""
    base = tiny_deformable_detr_config()
    bb = dataclasses.replace(base.backbone, norm="frozen_bn")
    cfg_a = base.replace(backbone=bb)
    cfg_b = cfg_a.replace(data=dataclasses.replace(
        cfg_a.data, canvas_height=160, canvas_width=192
    ))

    rng = np.random.RandomState(0)
    img = rng.rand(96, 96, 3).astype(np.float32)
    g = cfg_a.data.max_gt_boxes

    def batch_for(cfg):
        h, w = cfg.data.canvas_height, cfg.data.canvas_width
        canvas = np.zeros((1, h, w, 3), np.float32)
        canvas[0, :96, :96] = img
        gt = np.zeros((1, g, 4), np.float32)
        gt[0, 0] = [10.0, 20.0, 60.0, 80.0]
        gt[0, 1] = [30.0, 5.0, 90.0, 50.0]
        cls = np.zeros((1, g), np.int32)
        cls[0, :2] = [1, 2]
        valid = np.zeros((1, g), bool)
        valid[0, :2] = True
        return {
            "image": jnp.asarray(canvas),
            "image_hw": jnp.asarray([[96.0, 96.0]]),
            "gt_boxes": jnp.asarray(gt),
            "gt_classes": jnp.asarray(cls),
            "gt_valid": jnp.asarray(valid),
        }

    m_a, m_b = DeformableDETR(cfg_a), DeformableDETR(cfg_b)
    v = m_a.init(jax.random.key(0))  # param shapes are canvas-independent

    loss_a, _ = m_a.loss(v, batch_for(cfg_a), jax.random.key(1))
    loss_b, _ = m_b.loss(v, batch_for(cfg_b), jax.random.key(1))
    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-4)

    out_a = m_a.predict(v, batch_for(cfg_a))
    out_b = m_b.predict(v, batch_for(cfg_b))
    np.testing.assert_allclose(
        np.asarray(out_a["boxes"]), np.asarray(out_b["boxes"]), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_a["scores"]), np.asarray(out_b["scores"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["classes"]), np.asarray(out_b["classes"])
    )


def test_predict_recovers_planted_box():
    """Craft decoder outputs encoding one box at one query: the postprocess
    (top-k over flattened sigmoid scores, cxcywh decode by the true extent,
    clip) must return exactly that box with its class on top."""
    cfg = tiny_deformable_detr_config()
    m = DeformableDETR(cfg)
    q, c = cfg.deformable_detr.num_queries, cfg.data.num_classes
    logits = jnp.full((q, c), -8.0).at[7, 1].set(8.0)    # class 2
    gt = np.array([32.0, 32.0, 64.0, 64.0])
    boxes_n = jnp.tile(jnp.array([0.9, 0.9, 0.05, 0.05]), (q, 1)).at[7].set(
        jnp.array([48 / 128, 48 / 128, 32 / 128, 32 / 128])
    )
    boxes, scores, classes, valid = m._predict_single(
        logits, boxes_n, jnp.array([128.0, 128.0])
    )
    assert bool(valid[0])
    assert int(classes[0]) == 2
    np.testing.assert_allclose(np.asarray(boxes[0]), gt, atol=1e-3)
    assert float(scores[0]) > 0.99


# --------------------------------------------------------------- training


@pytest.mark.slow
def test_loss_decreases_and_trains():
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_deformable_detr_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, optimizer="adamw", learning_rate=1e-3, warmup_steps=0,
        grad_clip_norm=0.1, weight_decay=1e-4,
    ))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = make_batch(cfg)
    first = None
    for _ in range(20):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and first < 40.0
    assert last < 0.6 * first, (first, last)


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_deformable_detr_config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=8))
    model = build_model(cfg)
    mesh = make_mesh(num_data=8)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg, mesh=mesh)
    batch = shard_batch(mesh, make_batch(cfg, batch_size=8))
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "deformable_detr_tiny", "--dataset", "synthetic",
        "--steps", "2", "--no-mesh",
    ])
    out = capsys.readouterr().out
    assert "l1_box_loss" in out and "focal_cls_loss" in out

    summary = eval_cli.main([
        "--preset", "deformable_detr_tiny", "--dataset", "synthetic",
        "--max-images", "4", "--no-mesh",
    ])
    assert "mAP" in summary


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    from tpudet.data.preprocess import device_preprocess
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_deformable_detr_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "deformable_detr.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "deformable_detr"
    assert meta["max_detections"] == cfg.deformable_detr.max_detections
    assert meta["score_thresh"] == cfg.deformable_detr.score_thresh

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (1, 128, 128, 3), np.uint8)
    hw = np.array([[128.0, 128.0]], np.float32)
    got = jax.device_get(ServingModel.load(str(path))(image, hw))
    batch = device_preprocess(
        cfg, {"image": jnp.asarray(image), "image_hw": jnp.asarray(hw)},
        training=False,
    )
    want = jax.device_get(model.predict(variables, batch))
    np.testing.assert_array_equal(got["valid"], want["valid"])


@pytest.mark.slow
def test_train_step_tensor_parallel_deformable():
    """dp=4 x tp=2 over 8 fake devices: the deform-attention TP rules shard
    the value projection column-wise (= over heads after the reshape) and
    the out projection row-wise, the decoder's dense self-attention gets
    the Megatron MHA rules, FFNs shard column/row — optimizer state
    included — the step runs, and the TP layout survives donation."""
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.parallel.sharding_rules import shard_train_state
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_deformable_detr_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=4, learning_rate=1e-3, optimizer="adamw",
        warmup_steps=0, checkpoint_every=10**9,
    ))
    model = build_model(cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    state = shard_train_state(
        mesh, create_train_state(model, cfg.train, jax.random.key(0))
    )
    val = state.params["enc0"]["deform_attn"]["value"]["kernel"]
    out = state.params["dec0"]["cross_attn"]["out"]["kernel"]
    qkv = state.params["dec0"]["self_attn"]["query"]["kernel"]
    ffn = state.params["dec1"]["ffn"]["fc1"]["kernel"]
    for leaf in (val, out, qkv, ffn):
        assert not leaf.sharding.is_fully_replicated
    # Offset / attention-weight layers are query-sized: replicated.
    off = state.params["enc0"]["deform_attn"]["sampling_offsets"]["kernel"]
    assert off.sharding.is_fully_replicated

    step = make_train_step(model, cfg, mesh=mesh, state_example=state)
    batch = shard_batch(mesh, make_batch(cfg, batch_size=4))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    val = state.params["enc0"]["deform_attn"]["value"]["kernel"]
    assert not val.sharding.is_fully_replicated
    stem = jax.tree_util.tree_leaves(state.params["backbone"])[0]
    assert stem.sharding.is_fully_replicated


def test_coco_preset_mxu_dispatch_cpu_fallback():
    """The COCO preset defaults to sampling_gather='mxu'; off-TPU the
    dispatch must fall back to the flat gather (identical math) rather
    than attempting a Mosaic lowering — this guards the preset's CPU
    surfaces (tests, parity dry-runs, CPU learning proofs)."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model

    cfg = preset_config("coco_deformable_detr_r50")
    assert cfg.deformable_detr.sampling_gather == "mxu"
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=4, aspect_buckets=(),
            canvas_height=64, canvas_width=64, max_gt_boxes=5,
        ),
        deformable_detr=dataclasses.replace(
            cfg.deformable_detr, d_model=32, num_heads=2, enc_layers=1,
            dec_layers=1, ffn_dim=32, num_queries=8, max_detections=4,
        ),
        backbone=dataclasses.replace(cfg.backbone, name="resnet18"),
    )
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0
        ),
        "image_hw": jnp.asarray([[64.0, 64.0]], jnp.float32),
    }
    out = jax.device_get(model.predict(variables, batch))
    assert np.isfinite(out["boxes"]).all()
