"""RetinaNet assembly (single-stage detector family — a build extra beyond
the two-stage TF2 reference, reusing the framework's backbone/FPN/anchor/
matcher/NMS/eval components; Lin et al., arXiv:1708.02002).

TPU-first design notes (mirrors ``faster_rcnn.py``'s conventions):
  * One Flax module (``RetinaNetCore``) owns backbone + P3–P7 pyramid +
    shared head towers, so parameters live in a single tree that shards
    cleanly over a mesh.
  * No sampling anywhere: the focal loss runs over ALL anchors, which makes
    the training program fully static-shape by construction (the two-stage
    pipeline needs masked samplers to get there).
  * Anchors are trace-time NumPy constants (see ``tpudet.ops.anchors``),
    cached per canvas shape for aspect-bucketed loaders.
  * Inference keeps the candidate set static: per-level top-k over the
    flattened (anchor, class) scores, then ONE class-aware NMS over the
    union of levels via the shared class-offset kernel dispatch.

Batch dict contract is identical to ``FasterRCNN`` (image / image_hw /
gt_boxes / gt_classes / gt_valid), so the trainer, evaluator, serving
exporter, and CLIs are model-agnostic through ``models.build_model``.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.config import Config
from tpudet.kernels import class_aware_select
from tpudet.models.fpn import RetinaNetFPN
from tpudet.models.resnet import build_backbone
from tpudet.ops import anchors as anchor_ops
from tpudet.ops import boxes as box_ops
from tpudet.ops import selection
from tpudet.ops.matchers import match_boxes
from tpudet.train import losses as L


class RetinaNetHead(nn.Module):
    """Shared-across-levels classification + box towers (paper §4):
    ``num_convs`` 3x3 convs + ReLU per tower, then a 3x3 conv to A*C class
    logits (bias-initialized to the background prior) / A*4 box deltas.

    Outputs are flattened to [B, H*W*A, C] / [B, H*W*A, 4] in the exact
    (y, x, a) row-major order of ``ops.anchors.generate_anchors_np`` so row
    i aligns with anchor i; callers concatenate levels in sorted name order
    (p3..p7), matching the anchor constant's level order."""

    num_anchors: int          # anchors per cell (A)
    num_classes: int
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cls = feat
        box = feat
        # Tower convs keep the default (variance-preserving) init — the
        # classic all-σ=0.01 init shrinks activations ~O(σ·sqrt(fan_in)) per
        # layer, which starves the weight gradients and leaves predictions
        # spatially uniform for hundreds of steps (measured on the tiny
        # config: p stuck within 0.005 of the prior after 400 steps). Only
        # the OUTPUT convs use σ=0.01 + the prior bias, same pattern as
        # RPNHead.
        for i in range(self.num_convs):
            cls = nn.relu(nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"cls_conv{i}",
            )(cls))
            box = nn.relu(nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"box_conv{i}",
            )(box))
        # -log((1-pi)/pi) puts every anchor's initial fg probability at
        # prior_prob, so the step-0 focal sum over ~100k anchors is O(1)
        # instead of diverging (paper §3.3; §4.1 "initialization").
        bias = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias),
            name="cls_logits",
        )(cls)
        deltas = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="box_deltas",
        )(box)
        b = feat.shape[0]
        logits = logits.reshape(b, -1, self.num_classes).astype(jnp.float32)
        deltas = deltas.reshape(b, -1, 4).astype(jnp.float32)
        return logits, deltas


class RetinaNetCore(nn.Module):
    """Backbone + P3–P7 pyramid + shared head."""

    cfg: Config

    def setup(self):
        bb = self.cfg.backbone
        dtype = jnp.bfloat16 if bb.dtype == "bfloat16" else jnp.float32
        self.backbone = build_backbone(
            bb.name, bb.norm, dtype, bb.freeze_stem, s2d_stem=bb.s2d_stem,
            remat=bb.remat, stride_in_1x1=bb.stride_in_1x1,
        )
        self.fpn = RetinaNetFPN(dtype=dtype)
        r = self.cfg.retinanet
        self.head = RetinaNetHead(
            num_anchors=self.cfg.anchors.num_fpn_anchors_per_cell,
            num_classes=self.cfg.data.num_classes,
            num_convs=r.num_convs,
            channels=r.head_channels,
            prior_prob=r.prior_prob,
            dtype=dtype,
        )

    def features(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.fpn(self.backbone(images))

    def heads(self, feats: Dict[str, jnp.ndarray]):
        """Shared head over levels, concatenated in sorted level order
        (p3..p7 — lexicographic == stride order for single-digit levels)."""
        logits_all, deltas_all = [], []
        for name in sorted(feats.keys()):
            logits, deltas = self.head(feats[name])
            logits_all.append(logits)
            deltas_all.append(deltas)
        return (
            jnp.concatenate(logits_all, axis=1),
            jnp.concatenate(deltas_all, axis=1),
        )

    def __call__(self, images):  # parameter init only
        return self.heads(self.features(images))


class RetinaNet:
    """Pipeline orchestrator: pure functions over (variables, batch) — the
    same ``init`` / ``loss`` / ``predict`` surface as ``FasterRCNN`` so the
    trainer/evaluator/serving layers stay model-agnostic."""

    def __init__(self, cfg: Config):
        if cfg.rpn_only or cfg.det_only:
            raise ValueError(
                "rpn_only/det_only are two-stage (Faster R-CNN) training "
                "modes; a RetinaNet has neither an RPN nor a second stage"
            )
        if not cfg.backbone.use_fpn:
            raise ValueError(
                "model='retinanet' requires backbone.use_fpn=True "
                "(the detector is defined on a P3-P7 pyramid)"
            )
        if tuple(cfg.anchors.fpn_strides) != (8, 16, 32, 64, 128):
            # Same hazard as FCOS: the anchor grids key on these strides but
            # the RetinaNetFPN pyramid is FIXED at P3-P7; the default
            # AnchorConfig (4..64, the Faster R-CNN FPN layout) would
            # misalign every anchor row with its head row.
            raise ValueError(
                "model='retinanet' runs on the fixed P3-P7 pyramid: set "
                "anchors.fpn_strides=(8, 16, 32, 64, 128) "
                f"(got {cfg.anchors.fpn_strides})"
            )
        self.cfg = cfg
        self.core = RetinaNetCore(cfg)
        self._anchors_cache: Dict[Tuple[int, int], np.ndarray] = {}

    # ------------------------------------------------------------- anchors
    @property
    def feature_strides(self) -> Tuple[int, ...]:
        return tuple(self.cfg.anchors.fpn_strides)

    def anchor_boxes(self, canvas_hw: Tuple[int, int] | None = None) -> jnp.ndarray:
        """[N, 4] anchors over the static canvas, all levels concatenated in
        level order; sub-octave scales per cell (see AnchorConfig). Cached
        per canvas shape like FasterRCNN.anchor_boxes (same ceil-grid rule:
        SAME-padded stride-2 convs produce ceil(h/stride) dims)."""
        if canvas_hw is None:
            canvas_hw = (self.cfg.data.canvas_height, self.cfg.data.canvas_width)
        h, w = int(canvas_hw[0]), int(canvas_hw[1])
        if (h, w) not in self._anchors_cache:
            a = self.cfg.anchors
            ceil = lambda n, s: -(-n // s)  # noqa: E731
            per_level = [
                anchor_ops.generate_anchors_np(
                    ceil(h, s), ceil(w, s), s,
                    [sc * o for o in a.fpn_octave_scales], a.aspect_ratios,
                )
                for s, sc in zip(a.fpn_strides, a.fpn_scales)
            ]
            self._anchors_cache[(h, w)] = np.concatenate(per_level, axis=0)
        return jnp.asarray(self._anchors_cache[(h, w)])

    def anchor_level_sizes(self, canvas_hw: Tuple[int, int] | None = None):
        """Per-level anchor counts matching ``anchor_boxes``'s order."""
        if canvas_hw is None:
            canvas_hw = (self.cfg.data.canvas_height, self.cfg.data.canvas_width)
        h, w = int(canvas_hw[0]), int(canvas_hw[1])
        a = self.cfg.anchors
        per_cell = a.num_fpn_anchors_per_cell
        return [(-(-h // s)) * (-(-w // s)) * per_cell for s in a.fpn_strides]

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        h, w = self.cfg.data.canvas_height, self.cfg.data.canvas_width
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        return self.core.init(rng, dummy)

    # ---------------------------------------------------------------- loss
    def _targets_single(self, anchors, gt_boxes, gt_classes, gt_valid):
        """Per-image assignment over ALL anchors (no sampling): fg at
        IoU >= fg_thresh or per-GT argmax, bg below bg_thresh, the band in
        between ignored (labels -1 drop out of the focal normalizer)."""
        r = self.cfg.retinanet
        iou = box_ops.pairwise_iou(anchors, gt_boxes)
        matched_idx, labels = match_boxes(
            iou, r.fg_iou_thresh, r.bg_iou_thresh, gt_valid=gt_valid,
            allow_low_quality=True,
        )
        tgt_classes = jnp.where(labels == 1, gt_classes[matched_idx], 0)
        tgt_deltas = box_ops.encode_boxes(
            gt_boxes[matched_idx], anchors, r.box_reg_weights
        )
        return tgt_classes, tgt_deltas, labels

    def loss(
        self, variables, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training forward: one jittable static-shape program. ``rng`` is
        accepted for trainer-API parity but unused (no sampling)."""
        del rng
        cfg = self.cfg
        images = batch["image"]
        anchors = self.anchor_boxes(images.shape[1:3])

        feats = self.core.apply(
            variables, images, method=RetinaNetCore.features
        )
        cls_logits, box_deltas = self.core.apply(
            variables, feats, method=RetinaNetCore.heads
        )

        tgt_classes, tgt_deltas, labels = jax.vmap(
            functools.partial(self._targets_single, anchors)
        )(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

        r = cfg.retinanet
        cls_loss, box_loss = jax.vmap(
            functools.partial(
                L.retinanet_losses,
                alpha=r.focal_alpha, gamma=r.focal_gamma,
                box_weight=r.loss_weight_box, beta=r.smooth_l1_beta,
            )
        )(cls_logits, box_deltas, tgt_classes, tgt_deltas, labels)
        cls_loss, box_loss = jnp.mean(cls_loss), jnp.mean(box_loss)
        total = cls_loss + box_loss
        return total, {
            "loss": total,
            "focal_cls_loss": cls_loss,
            "box_loss": box_loss,
            "num_pos_anchors": jnp.mean(
                jnp.sum((labels == 1).astype(jnp.float32), axis=1)
            ),
        }

    # ----------------------------------------------------------- inference
    def _predict_single(self, anchors, level_sizes, cls_logits, deltas,
                        image_hw):
        """Per-image postprocess (paper §4): per level, top-k over the
        flattened (anchor, class) sigmoid scores above score_thresh; decode
        only those k boxes; one class-aware NMS over the level union.

        Selection runs on raw logits (sigmoid is monotone) and only the
        survivors are sigmoided/decoded — per-level top-k bounds both the
        decode work and the NMS candidate count statically."""
        r = self.cfg.retinanet
        num_classes = self.cfg.data.num_classes
        # Prefilter (see RetinaNetConfig.prefilter): the flattened
        # (anchor, class) selection axis is ~20.3M entries per image on the
        # COCO canvas — sorting it exactly measured 82.65 img/s/chip
        # (0.44x the flagship target; 3.3x slower than FCOS on the same
        # backbone class). One class-axis max per anchor + top-k over the
        # ~157k per-level anchor maxima bounds the expensive selection to
        # k rows; the survivors' class rows are gathered and re-selected
        # over k*C. Exact up to the containment caveat in the config note;
        # the eval CLI pins prefilter="off" as the parity referee.
        use_prefilter = r.prefilter != "off"
        boxes_l, scores_l, classes_l, valid_l = [], [], [], []
        offset = 0
        for n in level_sizes:
            # Static slices: level sizes are trace-time Python ints.
            lvl = cls_logits[offset:offset + n]  # [n, C]
            k = min(r.pre_nms_topk, n * num_classes)
            if use_prefilter and n > k:
                anchor_max = jnp.max(lvl, axis=1)  # [n] — one VPU pass
                kp = min(r.pre_nms_topk, n)
                _, surv = selection.blocked_top_k(anchor_max, kp)
                flat = lvl[surv].reshape(-1)  # [kp*C]
                k = min(r.pre_nms_topk, flat.shape[0])
                top_logits, flat_idx = selection.blocked_top_k(flat, k)
                anchor_idx = offset + surv[flat_idx // num_classes]
            else:
                # Paper-exact flattened (anchor, class) top-k — the worst
                # case the blocked exact selector was built for
                # (bit-identical to lax.top_k incl. tie order; falls back
                # when blocking can't win, e.g. the tiny test configs).
                top_logits, flat_idx = selection.blocked_top_k(
                    lvl.reshape(-1), k
                )
                anchor_idx = offset + flat_idx // num_classes
            cls_idx = (flat_idx % num_classes).astype(jnp.int32)
            scores = jax.nn.sigmoid(top_logits)
            decoded = box_ops.decode_boxes(
                deltas[anchor_idx], anchors[anchor_idx], r.box_reg_weights
            )
            boxes_l.append(box_ops.clip_boxes(decoded, image_hw))
            scores_l.append(scores)
            classes_l.append(cls_idx + 1)  # 1..C (0 = background/invalid)
            valid_l.append(scores > r.score_thresh)
            offset += n

        boxes = jnp.concatenate(boxes_l, axis=0)
        scores = jnp.concatenate(scores_l, axis=0)
        classes = jnp.concatenate(classes_l, axis=0)
        valid = jnp.concatenate(valid_l, axis=0)

        from tpudet.models.faster_rcnn import _nms_offset

        keep, out_scores, keep_valid = class_aware_select(
            boxes, scores, classes, r.nms_thresh, r.max_detections,
            valid_mask=valid, method=r.nms_method, sigma=r.soft_nms_sigma,
            prune_threshold=r.score_thresh, use_pallas=self.cfg.use_pallas,
            coordinate_offset=_nms_offset(self.cfg),
        )
        return (
            boxes[keep],
            out_scores,
            jnp.where(keep_valid, classes[keep], 0),
            keep_valid,
        )

    def predict(self, variables, batch: Dict[str, jnp.ndarray]):
        """Inference forward: one jittable program. Returns the framework's
        detection dict contract: boxes [B, D, 4], scores [B, D], classes
        [B, D] (1..C), valid [B, D], num_detections [B] — canvas coords,
        same as FasterRCNN.predict."""
        images = batch["image"]
        canvas_hw = images.shape[1:3]
        anchors = self.anchor_boxes(canvas_hw)
        level_sizes = self.anchor_level_sizes(canvas_hw)
        feats = self.core.apply(
            variables, images, method=RetinaNetCore.features
        )
        cls_logits, box_deltas = self.core.apply(
            variables, feats, method=RetinaNetCore.heads
        )
        boxes, scores, classes, valid = jax.vmap(
            functools.partial(self._predict_single, anchors, level_sizes)
        )(cls_logits, box_deltas, batch["image_hw"])
        return {
            "boxes": boxes,
            "scores": scores,
            "classes": classes,
            "valid": valid,
            "num_detections": jnp.sum(valid, axis=1).astype(jnp.int32),
        }
