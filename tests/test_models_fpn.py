"""FPN / proposal-protocol / pooler-variant model tests (split from
test_models.py so each file fits a 10-minute chunked-CI window on the
1-vCPU dev host)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from tpudet.config import tiny_test_config
from tpudet.models import FasterRCNN
from tests.test_models import make_batch  # shared batch synthesis


def test_fpn_packed_pooler_matches_default():
    """FPN packed-pyramid pooler (ONE einsum pair over all levels) produces
    the same detections as the default per-level masked-sum pooler."""
    import dataclasses

    cfg = tiny_test_config(use_fpn=True)
    batch = make_batch(cfg, b=2)
    base = FasterRCNN(cfg)
    variables = base.init(jax.random.key(0))
    ref = jax.jit(base.predict)(variables, batch)

    cfg2 = cfg.replace(roi=dataclasses.replace(cfg.roi, pooler="roi_align_packed"))
    out = jax.jit(FasterRCNN(cfg2).predict)(variables, batch)
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(ref["boxes"]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"]),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("use_fpn", [False, True])
def test_non_divisible_canvas_traces(use_fpn):
    """Anchor grids must use ceil(h/stride) to match SAME-padded conv
    output dims: a 120-px canvas (not divisible by 16 or 64) previously
    desynced anchor count from RPN output and failed at trace time
    (e.g. the 832x1120 COCO aspect bucket at FPN stride 64)."""
    cfg = tiny_test_config(canvas=120, use_fpn=use_fpn)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = {
        "image": jnp.zeros((1, 120, 120, 3), jnp.float32),
        "image_hw": jnp.asarray([[120.0, 120.0]]),
    }
    out = jax.jit(lambda v, b: model.predict(v, b))(variables, batch)
    assert out["boxes"].shape[0] == 1


def test_fpn_per_level_proposal_protocol():
    """FPN proposal generation: per-level top-k candidates, NMS within each
    level only (cross-level overlaps survive), union top-N by score."""
    cfg = tiny_test_config(canvas=128, use_fpn=True)
    model = FasterRCNN(cfg)
    sizes = model.anchor_level_sizes((128, 128))
    assert sum(sizes) == model.anchor_boxes((128, 128)).shape[0]

    n = sum(sizes)
    # Plant two identical high-score anchors on DIFFERENT levels: global NMS
    # would suppress one; per-level NMS must keep both.
    logits = np.full(n, -10.0, np.float32)
    deltas = np.zeros((n, 4), np.float32)
    i0 = 0                      # first anchor of level 0
    i1 = sizes[0]               # first anchor of level 1
    logits[i0] = 9.0
    logits[i1] = 8.0
    # Make their DECODED boxes identical (decode the level-1 anchor onto the
    # level-0 anchor box).
    anchors = np.asarray(model.anchor_boxes((128, 128)))

    def encode(src, dst):
        from tpudet.ops.boxes import encode_boxes

        return np.asarray(encode_boxes(
            jnp.asarray(dst[None]), jnp.asarray(src[None]), (1.0, 1.0, 1.0, 1.0)
        ))[0]

    deltas[i1] = encode(anchors[i1], anchors[i0])
    boxes, scores, valid = model.proposals(
        jnp.asarray(logits[None]), jnp.asarray(deltas[None]),
        jnp.asarray([[128.0, 128.0]]), training=False, canvas_hw=(128, 128),
    )
    kept_scores = np.asarray(scores[0])[np.asarray(valid[0])]
    # Both planted candidates survive (sigmoid(9), sigmoid(8) ~ 0.9997).
    assert (kept_scores > 0.999).sum() == 2


def test_approx_topk_serving_knob():
    """rpn.topk_method="approx" (serving-only approx_max_k selection) still
    surfaces well-separated high-score proposals, and training-mode
    proposal generation ignores the knob (always exact)."""
    import dataclasses

    cfg = tiny_test_config(canvas=128, use_fpn=True)
    cfg_apx = cfg.replace(rpn=dataclasses.replace(cfg.rpn, topk_method="approx"))
    model = FasterRCNN(cfg)
    model_apx = FasterRCNN(cfg_apx)
    n = sum(model.anchor_level_sizes((128, 128)))
    rng = np.random.default_rng(3)
    logits = rng.normal(-8.0, 0.5, n).astype(np.float32)
    planted = rng.choice(n, 5, replace=False)
    logits[planted] = 9.0
    deltas = rng.normal(0, 0.05, (n, 4)).astype(np.float32)
    args = (jnp.asarray(logits[None]), jnp.asarray(deltas[None]),
            jnp.asarray([[128.0, 128.0]]))
    for training in (False, True):
        _, s_ex, v_ex = model.proposals(*args, training=training,
                                        canvas_hw=(128, 128))
        _, s_ap, v_ap = model_apx.proposals(*args, training=training,
                                            canvas_hw=(128, 128))
        # The clearly-separated planted proposals survive either selection.
        assert (np.asarray(s_ex[0])[np.asarray(v_ex[0])] > 0.999).sum() >= 5
        assert (np.asarray(s_ap[0])[np.asarray(v_ap[0])] > 0.999).sum() >= 5
        if training:
            # Exact and approx configs are identical in training mode.
            np.testing.assert_array_equal(np.asarray(s_ex), np.asarray(s_ap))


def test_mxu_pooler_chunking_matches_unchunked():
    """When the einsum pooler's intermediate would exceed the per-image
    budget, RoIs are chunked through lax.map — results must be identical
    to the one-shot path (1000 FPN test proposals OOM a 16GB HBM without
    this)."""
    import dataclasses

    cfg = tiny_test_config(canvas=128, use_fpn=True)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    feats = model.core.apply(
        variables, jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32)),
        method=type(model.core).features,
    )
    feats1 = {k: v[0] for k, v in feats.items()}
    rois = rng.uniform(5, 100, (64, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(8, 24, (64, 2))
    one_shot = model._pool_single(feats1, jnp.asarray(rois))

    tiny_budget = cfg.replace(
        roi=dataclasses.replace(cfg.roi, mxu_chunk_budget_mb=1)
    )
    model2 = FasterRCNN(tiny_budget)
    chunked = model2._pool_single(feats1, jnp.asarray(rois))
    np.testing.assert_allclose(np.asarray(one_shot), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)


def test_postprocess_exact_mode_matches_oracle():
    """roi.max_nms_candidates = -1 (the eval CLI default, VERDICT r1 item 5)
    is protocol-EXACT: the final detections equal a NumPy per-class-NMS
    reference over ALL P*C candidates. A small finite cap deviates on the
    same dense scene — which is why eval defaults to exact and the cap is a
    serving-only knob."""
    import dataclasses

    from tests.oracles import np_nms
    from tpudet.ops import boxes as box_ops

    cfg0 = tiny_test_config()
    rng = np.random.default_rng(5)
    p, c = 40, cfg0.data.num_classes
    # Dense scene: clustered proposals, diffuse class scores (every class
    # clears the 0.05 threshold on most proposals).
    centers = rng.uniform(20, 100, (p, 2)).astype(np.float32)
    wh = rng.uniform(10, 30, (p, 2)).astype(np.float32)
    proposals = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    prop_valid = np.ones(p, bool)
    cls_logits = rng.normal(0, 0.7, (p, c + 1)).astype(np.float32)
    det_deltas = rng.normal(0, 0.1, (p, c, 4)).astype(np.float32)
    image_hw = np.asarray([128.0, 128.0], np.float32)

    def run(max_cand):
        cfg = cfg0.replace(roi=dataclasses.replace(
            cfg0.roi, max_nms_candidates=max_cand))
        model = FasterRCNN(cfg)
        b, s, cl, v = model._postprocess_single(
            jnp.asarray(proposals), jnp.asarray(prop_valid),
            jnp.asarray(cls_logits), jnp.asarray(det_deltas),
            jnp.asarray(image_hw),
        )
        b, s, cl, v = map(np.asarray, (b, s, cl, v))
        return b[v], s[v], cl[v]

    exact_b, exact_s, exact_c = run(-1)

    # NumPy reference: per-class decode -> clip -> thresh -> per-class NMS
    # -> global top max_detections by score.
    probs = np.asarray(jax.nn.softmax(cls_logits, -1))[:, 1:]
    ref = []
    for cls in range(c):
        boxes_c = np.asarray(box_ops.decode_boxes(
            jnp.asarray(det_deltas[:, cls]), jnp.asarray(proposals),
            cfg0.roi.box_reg_weights,
        ))
        boxes_c = np.asarray(box_ops.clip_boxes(
            jnp.asarray(boxes_c), image_hw))
        sc = probs[:, cls]
        ok = sc > cfg0.roi.score_thresh
        keep = np_nms(boxes_c[ok], sc[ok], cfg0.roi.nms_thresh,
                      cfg0.roi.max_detections)
        for k in keep:
            ref.append((float(sc[ok][k]), cls + 1, boxes_c[ok][k]))
    ref.sort(key=lambda r: -r[0])
    ref = ref[: cfg0.roi.max_detections]

    assert len(exact_b) == len(ref)
    for (rs, rc, rb), gb, gs, gc in zip(
        ref, exact_b, exact_s, exact_c
    ):
        assert gc == rc
        assert abs(gs - rs) < 1e-6
        np.testing.assert_allclose(gb, rb, atol=1e-5)

    # A small cap on the same scene loses candidates that exact NMS keeps.
    cap_b, cap_s, cap_c = run(16)
    assert len(cap_b) < len(exact_b)


def test_fpn_window_pooler_matches_default():
    """The pool-once-per-RoI windowed pooler produces the same detections
    as the per-level masked-sum default in the full model (window=56 on a
    128-px canvas: nothing can overflow a tile, so the fit-bumped level
    assignment coincides with the paper assignment and the comparison is
    exact to float tolerance)."""
    import dataclasses

    cfg = tiny_test_config(use_fpn=True)
    batch = make_batch(cfg, b=2)
    base = FasterRCNN(cfg)
    variables = base.init(jax.random.key(0))
    ref = jax.jit(base.predict)(variables, batch)

    cfg2 = cfg.replace(roi=dataclasses.replace(
        cfg.roi, pooler="roi_align_window", window=56))
    out = jax.jit(FasterRCNN(cfg2).predict)(variables, batch)
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(ref["boxes"]),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"]),
        rtol=1e-4, atol=1e-4,
    )


def test_window_pooler_trains():
    """With pooler=roi_align_window the train forward routes pooling
    through the differentiable masked sum (same fit-bumped level
    assignment — the Pallas kernel has no VJP): loss + grads must compile
    and be finite, and the loss must equal the default pooler's loss to
    float tolerance on a small-canvas scene (no fit bumping)."""
    import dataclasses

    cfg = tiny_test_config(use_fpn=True)
    batch = make_batch(cfg, b=2)
    base = FasterRCNN(cfg)
    variables = base.init(jax.random.key(0))
    rng = jax.random.key(1)

    def loss_of(cfg_):
        model = FasterRCNN(cfg_)

        def f(v):
            total, _ = model.loss(v, batch, rng)
            return total

        return jax.jit(jax.value_and_grad(f))(variables)

    ref_loss, ref_grads = loss_of(cfg)
    cfg2 = cfg.replace(roi=dataclasses.replace(
        cfg.roi, pooler="roi_align_window", window=56))
    loss, grads = loss_of(cfg2)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


def test_window_pooler_canvas_guard():
    """A window too small for the canvas (a p5 RoI could overflow its
    tile) must fail loudly at model build."""
    import dataclasses

    cfg = tiny_test_config(use_fpn=True)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, canvas_height=2048,
                                 canvas_width=2048),
        roi=dataclasses.replace(cfg.roi, pooler="roi_align_window",
                                window=56),
    )
    with pytest.raises(ValueError, match="roi.window"):
        FasterRCNN(cfg)


def test_unknown_topk_method_rejected():
    """A typo'd rpn.topk_method must fail at model build — dispatch falls
    through to exact on no match, so it would otherwise be silently inert."""
    import dataclasses

    cfg = tiny_test_config()
    cfg = cfg.replace(rpn=dataclasses.replace(cfg.rpn, topk_method="aprox"))
    with pytest.raises(ValueError, match="topk_method"):
        FasterRCNN(cfg)


def test_blocked_topk_bit_identical_predictions():
    """rpn.topk_method="blocked" must leave proposal generation bit-identical
    to "exact" in both modes (ops-level parity is proven in
    test_selection.py; this pins the model wiring, with a block size small
    enough that blocking actually engages at the tiny anchor count)."""
    import dataclasses

    cfg = tiny_test_config(canvas=128, use_fpn=True)
    cfg_blk = cfg.replace(rpn=dataclasses.replace(
        cfg.rpn, topk_method="blocked", topk_block_size=64))
    model = FasterRCNN(cfg)
    model_blk = FasterRCNN(cfg_blk)
    n = sum(model.anchor_level_sizes((128, 128)))
    rng = np.random.default_rng(7)
    logits = rng.normal(0.0, 2.0, n).astype(np.float32)
    deltas = rng.normal(0, 0.05, (n, 4)).astype(np.float32)
    args = (jnp.asarray(logits[None]), jnp.asarray(deltas[None]),
            jnp.asarray([[128.0, 128.0]]))
    for training in (False, True):
        b_ex, s_ex, v_ex = model.proposals(*args, training=training,
                                           canvas_hw=(128, 128))
        b_bl, s_bl, v_bl = model_blk.proposals(*args, training=training,
                                               canvas_hw=(128, 128))
        np.testing.assert_array_equal(np.asarray(b_ex), np.asarray(b_bl))
        np.testing.assert_array_equal(np.asarray(s_ex), np.asarray(s_bl))
        np.testing.assert_array_equal(np.asarray(v_ex), np.asarray(v_bl))

