import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from tpudet.config import tiny_test_config
from tpudet.models import FasterRCNN
from tpudet.models.resnet import ResNet, TinyBackbone
from tpudet.models.fpn import FPN
from tpudet.models.rpn_head import RPNHead
from tpudet.models.det_head import FastRCNNHead


def make_batch(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    h, w = cfg.data.canvas_height, cfg.data.canvas_width
    g = cfg.data.max_gt_boxes
    images = rng.normal(0, 1, (b, h, w, 3)).astype(np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_valid = np.zeros((b, g), bool)
    for i in range(b):
        n = 3
        xy1 = rng.uniform(0, w * 0.5, (n, 2))
        wh = rng.uniform(16, w * 0.4, (n, 2))
        gt_boxes[i, :n] = np.concatenate([xy1, np.minimum(xy1 + wh, w - 1)], -1)
        gt_classes[i, :n] = rng.integers(1, cfg.data.num_classes + 1, n)
        gt_valid[i, :n] = True
    return {
        "image": jnp.asarray(images),
        "image_hw": jnp.asarray([[h, w]] * b, jnp.float32),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }


def test_tiny_backbone_pyramid():
    m = TinyBackbone(width=16)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    feats = m.apply(vars_, x)
    assert feats["c2"].shape == (1, 16, 16, 16)
    assert feats["c4"].shape == (1, 4, 4, 16)
    assert feats["c5"].shape == (1, 2, 2, 16)


def test_resnet50_shapes_and_frozen_constants():
    m = ResNet(blocks=(1, 1, 1, 1), norm="frozen_bn")  # depth-1 for speed
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x)
    assert "constants" in vars_  # frozen BN stats live outside params
    feats = m.apply(vars_, x)
    assert feats["c2"].shape == (1, 16, 16, 256)
    assert feats["c3"].shape == (1, 8, 8, 512)
    assert feats["c4"].shape == (1, 4, 4, 1024)
    assert feats["c5"].shape == (1, 2, 2, 2048)


def test_fpn_shapes():
    m = FPN(channels=32)
    feats = {
        "c2": jnp.zeros((1, 32, 32, 8)),
        "c3": jnp.zeros((1, 16, 16, 16)),
        "c4": jnp.zeros((1, 8, 8, 32)),
        "c5": jnp.zeros((1, 4, 4, 64)),
    }
    vars_ = m.init(jax.random.key(0), feats)
    out = m.apply(vars_, feats)
    assert out["p2"].shape == (1, 32, 32, 32)
    assert out["p5"].shape == (1, 4, 4, 32)
    assert out["p6"].shape == (1, 2, 2, 32)


def test_rpn_head_alignment():
    m = RPNHead(num_anchors=6, conv_channels=32)
    feat = jnp.zeros((2, 8, 8, 16))
    vars_ = m.init(jax.random.key(0), feat)
    logits, deltas = m.apply(vars_, feat)
    assert logits.shape == (2, 8 * 8 * 6)
    assert deltas.shape == (2, 8 * 8 * 6, 4)


def test_det_head_shapes():
    m = FastRCNNHead(num_classes=5, fc_dim=32)
    rois = jnp.zeros((7, 7, 7, 16))
    vars_ = m.init(jax.random.key(0), rois)
    cls, deltas = m.apply(vars_, rois)
    assert cls.shape == (7, 6)
    assert deltas.shape == (7, 5, 4)
    m = FastRCNNHead(num_classes=5, fc_dim=32, class_agnostic=True)
    vars_ = m.init(jax.random.key(0), rois)
    _, deltas = m.apply(vars_, rois)
    assert deltas.shape == (7, 1, 4)


@pytest.mark.parametrize("use_fpn", [False, True])
def test_faster_rcnn_loss_finite(use_fpn):
    cfg = tiny_test_config(use_fpn=use_fpn)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = make_batch(cfg)
    loss, metrics = jax.jit(model.loss)(variables, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["num_fg_rois"]) > 0


def test_faster_rcnn_loss_differentiable():
    cfg = tiny_test_config()
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = make_batch(cfg)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def f(p):
        return model.loss({"params": p, **rest}, batch, jax.random.key(1))[0]

    grads = jax.jit(jax.grad(f))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in leaves)
    assert total > 0


@pytest.mark.parametrize("use_fpn", [False, True])
def test_faster_rcnn_predict_shapes(use_fpn):
    cfg = tiny_test_config(use_fpn=use_fpn)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = make_batch(cfg)
    out = jax.jit(model.predict)(variables, batch)
    d = cfg.roi.max_detections
    b = batch["image"].shape[0]
    assert out["boxes"].shape == (b, d, 4)
    assert out["scores"].shape == (b, d)
    assert out["classes"].shape == (b, d)
    assert out["valid"].shape == (b, d)
    assert np.all(np.asarray(out["num_detections"]) <= d)
    # Valid detections have classes in 1..C and boxes inside the canvas.
    boxes = np.asarray(out["boxes"])
    valid = np.asarray(out["valid"])
    classes = np.asarray(out["classes"])
    assert np.all(classes[valid] >= 1)
    assert np.all(classes[valid] <= cfg.data.num_classes)
    assert np.all(boxes[valid] >= 0)
    assert np.all(boxes[valid] <= cfg.data.canvas_width)


def test_loss_no_gt_is_finite():
    cfg = tiny_test_config()
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = make_batch(cfg)
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    loss, metrics = jax.jit(model.loss)(variables, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert float(metrics["num_fg_rois"]) == 0


@pytest.mark.parametrize("pooler", ["roi_align_gather", "roi_align_pallas",
                                    "crop_and_resize"])
def test_pooler_backends_run(pooler):
    """Every pooler backend produces valid predictions; roi_align* backends
    agree with the MXU default."""
    import dataclasses

    cfg = tiny_test_config()
    batch = make_batch(cfg, b=1)
    base = FasterRCNN(cfg)
    variables = base.init(jax.random.key(0))
    ref = jax.jit(base.predict)(variables, batch)

    cfg2 = cfg.replace(roi=dataclasses.replace(cfg.roi, pooler=pooler))
    out = jax.jit(FasterRCNN(cfg2).predict)(variables, batch)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    if pooler.startswith("roi_align"):
        np.testing.assert_allclose(
            np.asarray(out["boxes"]), np.asarray(ref["boxes"]),
            rtol=1e-3, atol=1e-2,
        )


def test_s2d_stem_equivalent_to_standard_stem():
    """The space-to-depth stem with transformed weights must reproduce the
    standard 7x7/s2 stem exactly (models/resnet.py::stem_kernel_to_s2d)."""
    from tpudet.models.resnet import convert_params_to_s2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    blocks = (1, 1, 1, 1)  # depth is irrelevant; the stem is what differs
    std = ResNet(blocks=blocks, norm="gn", freeze_stem=False)
    s2d = ResNet(blocks=blocks, norm="gn", freeze_stem=False, s2d_stem=True)
    params = std.init(jax.random.PRNGKey(0), x)["params"]
    out_std = std.apply({"params": params}, x)
    out_s2d = s2d.apply({"params": convert_params_to_s2d(params)}, x)
    for k in out_std:
        np.testing.assert_allclose(
            np.asarray(out_std[k]), np.asarray(out_s2d[k]),
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.parametrize("use_fpn", [False, True])
def test_orientation_bucketed_canvases_end_to_end(use_fpn):
    """With orientation buckets the same params must run loss + predict on
    both (short, long) and (long, short) canvases — anchors re-derive per
    static shape (two traces, one param tree). FPN covers the per-level
    anchor grids on non-square canvases (canvas_short must divide the
    deepest stride, 64)."""
    import dataclasses

    cfg = tiny_test_config(canvas=128, use_fpn=use_fpn)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, orientation_buckets=True, canvas_short=64,
    ))
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    for ch, cw in [(64, 128), (128, 64)]:
        batch = {
            "image": jnp.asarray(
                rng.integers(0, 255, (2, ch, cw, 3)).astype(np.float32)
            ),
            "image_hw": jnp.asarray([[ch, cw], [ch - 20, cw - 10]], jnp.float32),
            "gt_boxes": jnp.tile(
                jnp.asarray([[4.0, 4.0, 40.0, 40.0]]), (2, 10, 1)
            ),
            "gt_classes": jnp.ones((2, 10), jnp.int32),
            "gt_valid": jnp.ones((2, 10), bool).at[:, 5:].set(False),
        }
        loss, metrics = model.loss(variables, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        out = model.predict(variables, batch)
        assert out["boxes"].shape[0] == 2
        b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
        if len(b):
            assert b[:, 2].max() <= cw + 1e-3 and b[:, 3].max() <= ch + 1e-3


def test_resnet_remat_same_values_and_grads():
    """remat=True must not change forward values or gradients — it only
    changes what the backward pass stores vs recomputes."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    blocks = (1, 1, 1, 1)
    plain = ResNet(blocks=blocks, norm="gn", freeze_stem=False)
    remat = ResNet(blocks=blocks, norm="gn", freeze_stem=False, remat=True)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x)["c5"] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )



def test_vgg16_backbone_pyramid():
    """VGG-16 (the Faster R-CNN paper's original backbone): stride/channel
    contract c2@s4/256, c3@s8/512, c4@s16/512 (conv5_3 — the paper's RPN
    feature), c5@s32/512 (pool5, FPN-only)."""
    from tpudet.models.vgg import VGG

    model = VGG(freeze_stem=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert feats["c2"].shape == (1, 16, 16, 256)
    assert feats["c3"].shape == (1, 8, 8, 512)
    assert feats["c4"].shape == (1, 4, 4, 512)
    assert feats["c5"].shape == (1, 2, 2, 512)
    # No norm layers: the params tree is pure convs, no constants collection.
    assert set(variables) == {"params"}


def test_vgg16_faster_rcnn_end_to_end():
    """Full Faster R-CNN over the VGG-16 backbone: predict shapes + one
    grad step finite, with conv1/conv2 frozen (zero grads) per the paper's
    fine-tune-conv3_1-and-up practice."""
    import dataclasses

    cfg = tiny_test_config()
    cfg = cfg.replace(backbone=dataclasses.replace(
        cfg.backbone, name="vgg16", freeze_stem=True))
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = make_batch(cfg)

    out = jax.jit(model.predict)(variables, batch)
    assert out["boxes"].shape[0] == 2 and np.all(np.isfinite(out["boxes"]))

    def loss_fn(v):
        total, _ = model.loss(v, batch, jax.random.key(1))
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables)
    assert np.isfinite(float(loss))
    bb = grads["params"]["backbone"]
    for frozen in ("stage1", "stage2"):
        assert all(
            not np.any(np.asarray(leaf))
            for leaf in jax.tree_util.tree_leaves(bb[frozen])
        ), f"{frozen} should be frozen"
    assert any(
        np.any(np.asarray(leaf))
        for leaf in jax.tree_util.tree_leaves(bb["stage5"])
    )


def test_resnet18_backbone_pyramid():
    """Basic-block ResNet-18: stride/width contract c2@s4/64 .. c5@s32/512,
    and the full detector assembles and predicts over it."""
    import dataclasses

    from tpudet.models.resnet import ResNet, STAGE_BLOCKS

    m = ResNet(blocks=STAGE_BLOCKS["resnet18"], norm="frozen_bn",
               freeze_stem=False, basic=True)
    x = jnp.zeros((1, 64, 64, 3))
    feats = m.apply(m.init(jax.random.key(0), x), x)
    assert feats["c2"].shape == (1, 16, 16, 64)
    assert feats["c5"].shape == (1, 2, 2, 512)

    cfg = tiny_test_config()
    cfg = cfg.replace(backbone=dataclasses.replace(
        cfg.backbone, name="resnet18", norm="gn"))
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    out = jax.jit(model.predict)(variables, make_batch(cfg, b=1))
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
