"""End-to-end per-image parity vs a full TF2 pipeline (BASELINE north-star:
"per-image detection outputs matching within float tolerance"; VERDICT r1
item 2).

The closest achievable referee while the reference mount is empty: a
reference-shaped Faster R-CNN assembled from TF2 ops (keras.applications
ResNet-50 -> conv RPN -> top-k/decode/NMS -> tf.image.crop_and_resize -> FC
head -> per-class NMS; see tests/tf_pipeline_oracle.py), sharing every weight
with the tpudet model, compared e2e on fixed synthetic images.

Stated tolerances (documented here as the parity contract):
  * RPN objectness scores: atol 3e-3 (the accumulated f32 conv divergence
    between XLA-CPU and TF-CPU over 40+ ResNet layers; per-stage activation
    parity at rtol 1e-3 is asserted by test_import_weights.py).
  * Proposal stage: >= 95% of valid proposals match 1:1 (IoU > 0.99 and
    score atol 5e-3); counts within +-2.
  * Final detections: counts within +-2 per image, >= 90% matched 1:1
    across the batch (class equal, box atol 0.5 px, score atol 5e-3).
    The slack exists because float-level score reordering near top-k / NMS
    / threshold boundaries legitimately flips individual low-score
    candidates; weights are calibrated (decisive score spread) to keep such
    boundary ties rare.

Head weights use enlarged random scales rather than a trained checkpoint so
the test is deterministic and fast; scales are calibrated at runtime to fixed
target stds, keeping scores decisive (no sigmoid saturation, no degenerate
near-tie orderings) regardless of init details.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tpudet.config import (  # noqa: E402
    AnchorConfig,
    BackboneConfig,
    Config,
    DataConfig,
    ROIConfig,
    RPNConfig,
)
from tpudet.data import DataLoader, SyntheticDataset  # noqa: E402
from tpudet.data.preprocess import device_preprocess  # noqa: E402
from tpudet.models import FasterRCNN  # noqa: E402
from tpudet.models.faster_rcnn import DetectorCore  # noqa: E402
from tpudet.models.import_weights import (  # noqa: E402
    apply_backbone_weights,
    convert_keras_resnet,
    convert_keras_vgg16,
)
from tests.tf_pipeline_oracle import TFPipelineOracle  # noqa: E402

CANVAS = 128
BATCH = 6
NUM_CLASSES = 3


def _parity_config(backbone: str = "resnet50") -> Config:
    return Config(
        data=DataConfig(
            dataset="synthetic", num_classes=NUM_CLASSES,
            canvas_height=CANVAS, canvas_width=CANVAS,
            min_size=CANVAS, max_size=CANVAS, max_gt_boxes=10,
        ),
        backbone=BackboneConfig(
            name=backbone, norm="frozen_bn", stride_in_1x1=True,
            dtype="float32",
        ),
        # Small-image anchors; pre-NMS top-k >= the anchor count (8*8*9=576)
        # so no pre-top-k boundary exists to flip under float noise.
        anchors=AnchorConfig(scales=(16.0, 32.0, 64.0)),
        rpn=RPNConfig(pre_nms_topk_test=576, post_nms_topk_test=64),
        roi=ROIConfig(
            pooler="crop_and_resize", max_detections=20, score_thresh=0.05,
        ),
        use_pallas=False,
    )


def _tree_scale(params, path, factor):
    """Return a copy of ``params`` with every leaf under ``path`` scaled."""
    node = params
    for key in path[:-1]:
        node = node[key]
    target = dict(node[path[-1]])
    for leaf in target:
        target[leaf] = np.asarray(target[leaf], np.float32) * np.float32(factor)
    out = params
    rebuilt = target
    for depth in range(len(path) - 1, -1, -1):
        parent = params
        for key in path[:depth]:
            parent = parent[key]
        parent = dict(parent)
        parent[path[depth]] = rebuilt
        rebuilt = parent
    return rebuilt


@pytest.fixture(scope="module", params=["resnet50", "vgg16"])
def setup(request):
    # Both plausible reference backbones (SURVEY C5 [RECALL-MED]:
    # keras.applications ResNet50 or VGG16) run the identical parity
    # contract end-to-end.
    backbone = request.param
    tf.keras.utils.set_random_seed(0)
    if backbone == "resnet50":
        keras_bb = tf.keras.applications.ResNet50(
            weights=None, include_top=False, input_shape=(CANVAS, CANVAS, 3)
        )
        bb_params, bb_constants = convert_keras_resnet(keras_bb, "resnet50")
        feature_layer = "conv4_block6_out"
    else:
        keras_bb = tf.keras.applications.VGG16(
            weights=None, include_top=False, input_shape=(CANVAS, CANVAS, 3)
        )
        bb_params, bb_constants = convert_keras_vgg16(keras_bb)
        feature_layer = "block5_conv3"
    cfg = _parity_config(backbone)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    variables = apply_backbone_weights(variables, bb_params, bb_constants)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    ds = SyntheticDataset(
        num_classes=NUM_CLASSES, num_examples=BATCH, image_size=CANVAS
    )
    loader = DataLoader(cfg, ds, BATCH, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(cfg, {k: jnp.asarray(v) for k, v in raw.items()})
    images = np.asarray(batch["image"], np.float32)
    image_hw = np.asarray(batch["image_hw"], np.float32)

    # --- calibrate head weight scales to decisive, non-saturated spreads ---
    feats_fn = jax.jit(
        lambda v, im: model.core.apply(v, im, method=DetectorCore.features)
    )
    rpn_fn = jax.jit(
        lambda v, f: model.core.apply(v, f, method=DetectorCore.rpn)
    )
    feats = feats_fn(variables, batch["image"])
    logits, deltas = rpn_fn(variables, feats)
    params = variables["params"]
    params = _tree_scale(
        params, ("rpn_head", "objectness"), 2.5 / float(jnp.std(logits))
    )
    params = _tree_scale(
        params, ("rpn_head", "deltas"), 0.25 / float(jnp.std(deltas))
    )
    variables = dict(variables, params=params)

    # Detection head: calibrate on anchor-shaped RoIs pooled from image 0.
    feats0 = jax.tree_util.tree_map(lambda a: a[0], feats)
    rois = np.asarray(model.anchor_boxes())[::7][:64]
    rois = np.clip(rois, 4.0, CANVAS - 4.0).astype(np.float32)
    pooled = model._pool_single(feats0, jnp.asarray(rois))
    cls_logits, det_deltas = model.core.apply(
        variables, pooled, method=DetectorCore.roi_head
    )
    params = variables["params"]
    params = _tree_scale(
        params, ("det_head", "cls"), 2.0 / float(jnp.std(cls_logits))
    )
    params = _tree_scale(
        params, ("det_head", "bbox"), 1.0 / float(jnp.std(det_deltas))
    )
    variables = dict(variables, params=params)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    oracle = TFPipelineOracle(
        cfg, keras_bb, variables, np.asarray(model.anchor_boxes()),
        feature_layer=feature_layer,
    )
    tf_out = [oracle.detect(images[i], image_hw[i]) for i in range(BATCH)]
    return cfg, model, variables, batch, images, image_hw, tf_out


def _greedy_match(boxes_a, boxes_b, extra_ok, iou_min):
    """1:1 greedy matching; returns number matched."""
    from tests.oracles import np_iou

    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return 0
    iou = np_iou(boxes_a, boxes_b)
    used = np.zeros(len(boxes_b), bool)
    matched = 0
    for i in range(len(boxes_a)):
        best, best_iou = -1, iou_min
        for j in range(len(boxes_b)):
            if not used[j] and iou[i, j] >= best_iou and extra_ok(i, j):
                best, best_iou = j, iou[i, j]
        if best >= 0:
            used[best] = True
            matched += 1
    return matched


def test_rpn_score_parity(setup):
    cfg, model, variables, batch, images, image_hw, tf_out = setup
    feats = model.core.apply(
        variables, batch["image"], method=DetectorCore.features
    )
    logits, _ = model.core.apply(variables, feats, method=DetectorCore.rpn)
    ours = np.asarray(jax.nn.sigmoid(logits))
    for i in range(BATCH):
        np.testing.assert_allclose(
            ours[i], tf_out[i]["rpn_scores"], atol=3e-3,
            err_msg=f"image {i}",
        )


def test_proposal_parity(setup):
    cfg, model, variables, batch, images, image_hw, tf_out = setup
    feats = model.core.apply(
        variables, batch["image"], method=DetectorCore.features
    )
    logits, deltas = model.core.apply(
        variables, feats, method=DetectorCore.rpn
    )
    boxes, scores, valid = jax.jit(
        lambda l, d, hw: model.proposals(l, d, hw, training=False)
    )(logits, deltas, batch["image_hw"])
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))

    total_ours = total_matched = 0
    for i in range(BATCH):
        ours_b, ours_s = boxes[i][valid[i]], scores[i][valid[i]]
        tf_b = tf_out[i]["proposals"]
        tf_s = tf_out[i]["proposal_scores"]
        assert abs(len(ours_b) - len(tf_b)) <= 2, (
            f"image {i}: {len(ours_b)} vs {len(tf_b)} proposals"
        )
        matched = _greedy_match(
            ours_b, tf_b,
            lambda a, b: abs(ours_s[a] - tf_s[b]) < 5e-3, iou_min=0.99,
        )
        total_ours += len(ours_b)
        total_matched += matched
    assert total_matched >= 0.95 * total_ours, (
        f"proposal match rate {total_matched}/{total_ours}"
    )


def test_e2e_detection_parity(setup):
    cfg, model, variables, batch, images, image_hw, tf_out = setup
    out = jax.jit(model.predict)(variables, batch)
    boxes = np.asarray(out["boxes"])
    scores = np.asarray(out["scores"])
    classes = np.asarray(out["classes"])
    valid = np.asarray(out["valid"])

    total_ours = total_matched = 0
    for i in range(BATCH):
        keep = valid[i]
        ours_b, ours_s, ours_c = boxes[i][keep], scores[i][keep], classes[i][keep]
        tf_b, tf_s, tf_c = (
            tf_out[i]["boxes"], tf_out[i]["scores"], tf_out[i]["classes"]
        )
        assert abs(len(ours_b) - len(tf_b)) <= 2, (
            f"image {i}: {len(ours_b)} vs {len(tf_b)} detections"
        )

        def extra_ok(a, b, ours_s=ours_s, ours_c=ours_c, ours_b=ours_b,
                     tf_s=tf_s, tf_c=tf_c, tf_b=tf_b):
            return (
                ours_c[a] == tf_c[b]
                and abs(ours_s[a] - tf_s[b]) < 5e-3
                and np.max(np.abs(ours_b[a] - tf_b[b])) < 0.5
            )

        matched = _greedy_match(ours_b, tf_b, extra_ok, iou_min=0.95)
        total_ours += len(ours_b)
        total_matched += matched
    assert total_ours > 0, "calibrated pipeline produced no detections"
    assert total_matched >= 0.90 * total_ours, (
        f"e2e detection match rate {total_matched}/{total_ours}"
    )
