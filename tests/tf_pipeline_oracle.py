"""Full-pipeline TF2 Faster R-CNN oracle (SURVEY.md §4.2; BASELINE north-star
"per-image detection outputs matching within float tolerance").

This assembles the reference-shaped detector entirely from TF2 ops —
keras.applications ResNet-50 backbone, ``tf.nn.conv2d`` heads,
``tf.math.top_k`` / ``tf.image.non_max_suppression`` proposal generation,
``tf.image.crop_and_resize`` pooling, dense-layer Fast R-CNN head, per-class
NMS post-processing — sharing weights with a tpudet ``FasterRCNN`` variables
tree. It is the closest achievable end-to-end float-tolerance referee while
the ``/root/reference`` mount is empty (it contains no files to cite), and
becomes the harness for the real reference if the mount ever populates.

Unlike tpudet's static-shape pipeline this oracle is eager, dynamic-shape TF
(boolean_mask instead of validity masks) — deliberately so: it mirrors how the
TF2 reference composes the same stock ops (SURVEY.md C10/C12/C16).
"""

from __future__ import annotations

import math

import numpy as np

BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def _tf():
    import tensorflow as tf

    return tf


def decode_boxes_np(deltas, anchors, weights):
    """Mirror of tpudet.ops.boxes.decode_boxes in f32 NumPy."""
    deltas = np.asarray(deltas, np.float32)
    anchors = np.asarray(anchors, np.float32)
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + np.float32(0.5) * wa
    ya = anchors[..., 1] + np.float32(0.5) * ha
    wx, wy, ww, wh = [np.float32(v) for v in weights]
    tx = deltas[..., 0] / wx
    ty = deltas[..., 1] / wy
    tw = np.minimum(deltas[..., 2] / ww, np.float32(BBOX_XFORM_CLIP))
    th = np.minimum(deltas[..., 3] / wh, np.float32(BBOX_XFORM_CLIP))
    x = tx * wa + xa
    y = ty * ha + ya
    w = np.exp(tw) * wa
    h = np.exp(th) * ha
    half = np.float32(0.5)
    return np.stack(
        [x - half * w, y - half * h, x + half * w, y + half * h], axis=-1
    )


def clip_boxes_np(boxes, image_hw):
    h, w = np.float32(image_hw[0]), np.float32(image_hw[1])
    x1 = np.clip(boxes[..., 0], 0, w)
    y1 = np.clip(boxes[..., 1], 0, h)
    x2 = np.clip(boxes[..., 2], 0, w)
    y2 = np.clip(boxes[..., 3], 0, h)
    return np.stack([x1, y1, x2, y2], axis=-1)


class TFPipelineOracle:
    """TF2 Faster R-CNN forward sharing weights with a tpudet model.

    ``variables`` is the tpudet FasterRCNN variables tree (already carrying
    the same backbone weights as ``keras_backbone`` — see
    ``tests/test_e2e_tf_parity.py`` for the wiring); head weights are read
    out of it as NumPy and applied with raw TF ops.
    """

    def __init__(self, cfg, keras_backbone, variables, anchors,
                 feature_layer="conv4_block6_out"):
        tf = _tf()
        self.cfg = cfg
        self.anchors = np.asarray(anchors, np.float32)
        # Stride-16 feature extractor: identical activations to tpudet's c4
        # ("conv4_block6_out" for ResNet-50, "block5_conv3" for VGG-16 —
        # conversion parity is separately asserted by
        # tests/test_import_weights.py).
        self.c4_model = tf.keras.Model(
            keras_backbone.input,
            keras_backbone.get_layer(feature_layer).output,
        )
        p = variables["params"]
        self.w = {
            "neck_k": self._np(p["neck_conv"]["kernel"]),
            "neck_b": self._np(p["neck_conv"]["bias"]),
            "rpn_k": self._np(p["rpn_head"]["conv"]["kernel"]),
            "rpn_b": self._np(p["rpn_head"]["conv"]["bias"]),
            "obj_k": self._np(p["rpn_head"]["objectness"]["kernel"]),
            "obj_b": self._np(p["rpn_head"]["objectness"]["bias"]),
            "del_k": self._np(p["rpn_head"]["deltas"]["kernel"]),
            "del_b": self._np(p["rpn_head"]["deltas"]["bias"]),
            "fc1_k": self._np(p["det_head"]["fc1"]["kernel"]),
            "fc1_b": self._np(p["det_head"]["fc1"]["bias"]),
            "fc2_k": self._np(p["det_head"]["fc2"]["kernel"]),
            "fc2_b": self._np(p["det_head"]["fc2"]["bias"]),
            "cls_k": self._np(p["det_head"]["cls"]["kernel"]),
            "cls_b": self._np(p["det_head"]["cls"]["bias"]),
            "bbox_k": self._np(p["det_head"]["bbox"]["kernel"]),
            "bbox_b": self._np(p["det_head"]["bbox"]["bias"]),
        }

    @staticmethod
    def _np(x):
        return np.asarray(x, np.float32)

    # ------------------------------------------------------------ pipeline
    def rpn_raw(self, image):
        """Normalized image [H, W, 3] -> (scores [N], deltas [N, 4],
        feat [h, w, C]) with N in tpudet's (y, x, a) anchor order."""
        tf = _tf()
        w = self.w
        c4 = self.c4_model(image[None], training=False)
        feat = tf.nn.relu(
            tf.nn.conv2d(c4, w["neck_k"], 1, "SAME") + w["neck_b"]
        )
        x = tf.nn.relu(
            tf.nn.conv2d(feat, w["rpn_k"], 1, "SAME") + w["rpn_b"]
        )
        logits = tf.nn.conv2d(x, w["obj_k"], 1, "SAME") + w["obj_b"]
        deltas = tf.nn.conv2d(x, w["del_k"], 1, "SAME") + w["del_b"]
        scores = tf.sigmoid(tf.reshape(logits, [-1])).numpy()
        deltas = tf.reshape(deltas, [-1, 4]).numpy()
        return scores, deltas, feat[0].numpy()

    def proposals(self, scores, deltas, image_hw):
        """C10 with TF ops: top-k -> decode -> clip -> min-size ->
        tf.image.non_max_suppression -> top-N. Returns ([P, 4], [P])."""
        tf = _tf()
        rpn = self.cfg.rpn
        n = self.anchors.shape[0]
        k_pre = min(n, rpn.pre_nms_topk_test)
        top_scores, idx = tf.math.top_k(scores, k_pre)
        top_scores = top_scores.numpy()
        idx = idx.numpy()
        boxes = decode_boxes_np(
            deltas[idx], self.anchors[idx], rpn.box_reg_weights
        )
        boxes = clip_boxes_np(boxes, image_hw)
        wh = boxes[:, 2:] - boxes[:, :2]
        ok = (wh[:, 0] > rpn.min_box_size) & (wh[:, 1] > rpn.min_box_size)
        boxes, top_scores = boxes[ok], top_scores[ok]
        # tf NMS takes [y1, x1, y2, x2]; IoU is coordinate-permutation
        # invariant so swapping x/y is exact.
        keep = tf.image.non_max_suppression(
            boxes[:, [1, 0, 3, 2]], top_scores,
            max_output_size=rpn.post_nms_topk_test,
            iou_threshold=rpn.nms_thresh,
        ).numpy()
        return boxes[keep], top_scores[keep]

    def roi_features(self, feat, proposals):
        """C12 via tf.image.crop_and_resize (feature coords / (dim - 1))."""
        tf = _tf()
        stride = float(self.cfg.anchors.stride)
        fb = proposals / stride
        h, w = feat.shape[0], feat.shape[1]
        tf_boxes = np.stack(
            [fb[:, 1] / (h - 1), fb[:, 0] / (w - 1),
             fb[:, 3] / (h - 1), fb[:, 2] / (w - 1)], axis=-1,
        ).astype(np.float32)
        s = self.cfg.roi.output_size
        return tf.image.crop_and_resize(
            feat[None], tf_boxes, np.zeros(len(fb), np.int32), [s, s]
        ).numpy()

    def det_head(self, pooled):
        """C13: flatten -> fc1 -> fc2 -> (cls logits, per-class deltas)."""
        tf = _tf()
        w = self.w
        x = tf.reshape(tf.constant(pooled), [pooled.shape[0], -1])
        x = tf.nn.relu(tf.matmul(x, w["fc1_k"]) + w["fc1_b"])
        x = tf.nn.relu(tf.matmul(x, w["fc2_k"]) + w["fc2_b"])
        cls_logits = (tf.matmul(x, w["cls_k"]) + w["cls_b"]).numpy()
        deltas = (tf.matmul(x, w["bbox_k"]) + w["bbox_b"]).numpy()
        return cls_logits, deltas.reshape(pooled.shape[0], -1, 4)

    def postprocess(self, proposals, cls_logits, det_deltas, image_hw):
        """C16: per-class decode -> score thresh -> per-class
        tf.image.non_max_suppression -> global top max_detections."""
        tf = _tf()
        roi = self.cfg.roi
        num_classes = self.cfg.data.num_classes
        probs = tf.nn.softmax(cls_logits, axis=-1).numpy()[:, 1:]  # [P, C]
        if det_deltas.shape[1] == 1:
            det_deltas = np.broadcast_to(
                det_deltas, (len(proposals), num_classes, 4)
            )
        all_boxes, all_scores, all_classes = [], [], []
        for c in range(num_classes):
            boxes_c = decode_boxes_np(
                det_deltas[:, c], proposals, roi.box_reg_weights
            )
            boxes_c = clip_boxes_np(boxes_c, image_hw)
            scores_c = probs[:, c]
            ok = scores_c > roi.score_thresh
            boxes_c, scores_c = boxes_c[ok], scores_c[ok]
            if len(boxes_c) == 0:
                continue
            keep = tf.image.non_max_suppression(
                boxes_c[:, [1, 0, 3, 2]], scores_c,
                max_output_size=roi.max_detections,
                iou_threshold=roi.nms_thresh,
            ).numpy()
            all_boxes.append(boxes_c[keep])
            all_scores.append(scores_c[keep])
            all_classes.append(np.full(len(keep), c + 1, np.int32))
        if not all_boxes:
            return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                    np.zeros(0, np.int32))
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        classes = np.concatenate(all_classes)
        order = np.argsort(-scores, kind="stable")[: roi.max_detections]
        return boxes[order], scores[order], classes[order]

    def detect(self, image, image_hw):
        """Full 3b forward on one normalized image -> dict of final outputs
        plus the proposal stage (for stage-localized parity checks)."""
        scores, deltas, feat = self.rpn_raw(image)
        props, prop_scores = self.proposals(scores, deltas, image_hw)
        pooled = self.roi_features(feat, props)
        cls_logits, det_deltas = self.det_head(pooled)
        boxes, det_scores, classes = self.postprocess(
            props, cls_logits, det_deltas, image_hw
        )
        return {
            "rpn_scores": scores,
            "proposals": props,
            "proposal_scores": prop_scores,
            "boxes": boxes,
            "scores": det_scores,
            "classes": classes,
        }
