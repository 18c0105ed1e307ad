"""Full-pipeline TF2 Faster R-CNN **FPN** oracle (BASELINE north-star
"per-image detection outputs matching within float tolerance", extended to
the flagship FPN configuration; companion to tests/tf_pipeline_oracle.py).

Assembled entirely from stock TF2 ops mirroring how a TF2 reference would
compose an FPN detector: keras.applications ResNet-50 stage outputs ->
1x1 lateral convs + nearest x2 top-down merge + 3x3 output convs (FPN
paper) -> shared conv RPN head per level -> per-level ``tf.math.top_k`` +
decode + per-level ``tf.image.non_max_suppression`` with a global score
top-N (the FPN/Detectron proposal protocol, mirroring
``FasterRCNN._generate_proposals_single_fpn``) ->
``tf.image.crop_and_resize`` at the FPN-paper-assigned level (canonical
k = floor(4 + log2(sqrt(area)/224)), NO fit-bumping — the tpudet side under
test runs the masked-sum pooler, which uses the same canonical assignment)
-> dense Fast R-CNN head -> per-class NMS.

Weights are shared with a tpudet ``FasterRCNN(use_fpn=True)`` variables
tree. Eager, dynamic-shape TF throughout (boolean_mask instead of validity
masks) — deliberately the opposite formulation of tpudet's static-shape
XLA pipeline, so agreement is evidence about protocol semantics, not
shared code.
"""

from __future__ import annotations

import numpy as np

from tests.tf_pipeline_oracle import (
    TFPipelineOracle,
    clip_boxes_np,
    decode_boxes_np,
)

_STAGE_OUT = {
    "c2": "conv2_block3_out",
    "c3": "conv3_block4_out",
    "c4": "conv4_block6_out",
    "c5": "conv5_block3_out",
}


def assign_levels_np(boxes):
    """Canonical FPN-paper level assignment in NumPy (mirror of
    ops.roi_align.fpn_assign_levels with fit_window=0, including its 1e-8
    log guard)."""
    boxes = np.asarray(boxes, np.float32)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    k = np.floor(4.0 + np.log2(np.sqrt(areas) / 224.0 + 1e-8))
    return np.clip(k, 2, 5).astype(np.int32)


class TFPipelineOracleFPN(TFPipelineOracle):
    """TF2 FPN Faster R-CNN forward sharing weights with a tpudet model.

    ``anchors`` is the model's concatenated per-level anchor constant
    (``FasterRCNN.anchor_boxes()``) and ``level_sizes`` the matching
    per-level counts (``FasterRCNN.anchor_level_sizes()``), both taken as
    given: anchor-generation parity is asserted separately
    (tests/test_anchors.py).
    """

    def __init__(self, cfg, keras_backbone, variables, anchors, level_sizes):
        import tensorflow as tf

        self.cfg = cfg
        self.anchors = np.asarray(anchors, np.float32)
        self.level_sizes = [int(n) for n in level_sizes]
        self.stage_model = tf.keras.Model(
            keras_backbone.input,
            [keras_backbone.get_layer(_STAGE_OUT[c]).output
             for c in ("c2", "c3", "c4", "c5")],
        )
        p = variables["params"]
        self.w = {
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
        for c in ("c2", "c3", "c4", "c5"):
            self.w[f"lat_{c}_k"] = self._np(p["fpn"][f"lateral_{c}"]["kernel"])
            self.w[f"lat_{c}_b"] = self._np(p["fpn"][f"lateral_{c}"]["bias"])
        for l in (2, 3, 4, 5):
            self.w[f"out_p{l}_k"] = self._np(p["fpn"][f"output_p{l}"]["kernel"])
            self.w[f"out_p{l}_b"] = self._np(p["fpn"][f"output_p{l}"]["bias"])

    # ------------------------------------------------------------ pipeline
    def fpn_features(self, image):
        """Normalized image [H, W, 3] -> [p2, p3, p4, p5, p6] numpy maps
        (FPN paper: laterals, nearest-x2 top-down merge, 3x3 outputs, p6 by
        stride-2 subsampling of p5 — mirror of models/fpn.py)."""
        import tensorflow as tf

        w = self.w
        stages = self.stage_model(image[None], training=False)
        laterals = [
            (tf.nn.conv2d(c, w[f"lat_c{i + 2}_k"], 1, "SAME")
             + w[f"lat_c{i + 2}_b"]).numpy()[0]
            for i, c in enumerate(stages)
        ]
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in range(2, -1, -1):
            up = merged[i + 1]
            th, tw = laterals[i].shape[0], laterals[i].shape[1]
            up = np.repeat(np.repeat(up, 2, axis=0), 2, axis=1)[:th, :tw, :]
            merged[i] = laterals[i] + up
        outs = [
            (tf.nn.conv2d(m[None], w[f"out_p{i + 2}_k"], 1, "SAME")
             + w[f"out_p{i + 2}_b"]).numpy()[0]
            for i, m in enumerate(merged)
        ]
        # p6: 1x1 max-pool stride 2 == stride-2 subsampling.
        outs.append(outs[3][::2, ::2, :])
        return outs

    def rpn_raw_fpn(self, image):
        """-> (scores [N] SIGMOID, logits [N], deltas [N, 4], levels) with N
        concatenated in level order p2..p6, (y, x, a) row-major per level —
        the exact flattening of DetectorCore.rpn."""
        import tensorflow as tf

        w = self.w
        levels = self.fpn_features(image)
        logits_all, deltas_all = [], []
        for feat in levels:
            x = tf.nn.relu(
                tf.nn.conv2d(feat[None], w["rpn_k"], 1, "SAME") + w["rpn_b"]
            )
            logits = tf.nn.conv2d(x, w["obj_k"], 1, "SAME") + w["obj_b"]
            deltas = tf.nn.conv2d(x, w["del_k"], 1, "SAME") + w["del_b"]
            logits_all.append(tf.reshape(logits, [-1]).numpy())
            deltas_all.append(tf.reshape(deltas, [-1, 4]).numpy())
        logits = np.concatenate(logits_all)
        deltas = np.concatenate(deltas_all)
        sigmoid = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))
        return sigmoid.astype(np.float32), logits, deltas, levels

    def proposals_fpn(self, logits, deltas, image_hw):
        """FPN proposal protocol with TF ops (mirror of
        _generate_proposals_single_fpn): per-level top-k on raw logits ->
        sigmoid survivors -> decode -> clip -> min-size -> per-level
        tf.image.non_max_suppression -> global top-N by score."""
        import tensorflow as tf

        rpn = self.cfg.rpn
        k_level = rpn.fpn_pre_nms_topk_per_level_test
        k_post = rpn.post_nms_topk_test

        cand = []
        start = 0
        for n_l in self.level_sizes:
            sl = slice(start, start + n_l)
            start += n_l
            top_l, idx = tf.math.top_k(logits[sl], min(n_l, k_level))
            idx = idx.numpy()
            scores_l = 1.0 / (1.0 + np.exp(-top_l.numpy().astype(np.float64)))
            boxes_l = decode_boxes_np(
                deltas[sl][idx], self.anchors[sl][idx], rpn.box_reg_weights
            )
            boxes_l = clip_boxes_np(boxes_l, image_hw)
            wh = boxes_l[:, 2:] - boxes_l[:, :2]
            ok = ((wh[:, 0] > rpn.min_box_size)
                  & (wh[:, 1] > rpn.min_box_size))
            boxes_l, scores_l = boxes_l[ok], scores_l[ok].astype(np.float32)
            if len(boxes_l) == 0:
                continue
            keep = tf.image.non_max_suppression(
                boxes_l[:, [1, 0, 3, 2]], scores_l,
                max_output_size=k_post, iou_threshold=rpn.nms_thresh,
            ).numpy()
            cand.append((boxes_l[keep], scores_l[keep]))
        if not cand:
            return np.zeros((0, 4), np.float32), np.zeros(0, np.float32)
        boxes = np.concatenate([b for b, _ in cand])
        scores = np.concatenate([s for _, s in cand])
        order = np.argsort(-scores, kind="stable")[:k_post]
        return boxes[order], scores[order]

    def roi_features_fpn(self, level_feats, proposals):
        """C12 at the canonically assigned level via
        tf.image.crop_and_resize (feature coords / (dim - 1)); level strides
        4/8/16/32 (p2..p5 — p6 is proposal-only, per the FPN paper)."""
        import tensorflow as tf

        s = self.cfg.roi.output_size
        c = level_feats[0].shape[-1]
        k = assign_levels_np(proposals)
        pooled = np.zeros((len(proposals), s, s, c), np.float32)
        for level, stride in zip((2, 3, 4, 5), (4.0, 8.0, 16.0, 32.0)):
            sel = np.nonzero(k == level)[0]
            if len(sel) == 0:
                continue
            feat = level_feats[level - 2]
            h, w = feat.shape[0], feat.shape[1]
            fb = proposals[sel] / stride
            tf_boxes = np.stack(
                [fb[:, 1] / (h - 1), fb[:, 0] / (w - 1),
                 fb[:, 3] / (h - 1), fb[:, 2] / (w - 1)], axis=-1,
            ).astype(np.float32)
            pooled[sel] = tf.image.crop_and_resize(
                feat[None], tf_boxes, np.zeros(len(sel), np.int32), [s, s]
            ).numpy()
        return pooled

    def detect(self, image, image_hw):
        """Full FPN forward on one normalized image -> dict of final outputs
        plus the RPN/proposal stages (for stage-localized parity checks)."""
        scores, logits, deltas, level_feats = self.rpn_raw_fpn(image)
        props, prop_scores = self.proposals_fpn(logits, deltas, image_hw)
        pooled = self.roi_features_fpn(level_feats[:4], props)
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
