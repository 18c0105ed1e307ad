"""Cascade R-CNN assembly (multi-stage two-stage family — a build extra
beyond the single-IoU TF2 reference; Cai & Vasconcelos, arXiv:1712.00726).

A sequence of detection heads trained at increasing IoU thresholds
(0.5 / 0.6 / 0.7), each refining the previous stage's boxes, so each head
trains on — and at inference sees — a progressively higher-quality proposal
distribution. This resolves the paper's IoU-threshold paradox: one head
trained at 0.5 degrades high-quality boxes, one trained at 0.7 starves on
raw proposals.

TPU-first formulation (everything static-shape):
  * Stage 1 reuses the shared balanced sampler (positives-first static
    prefix, identical to Faster R-CNN's stage 2).
  * Later stages keep the SAME K sampled RoIs and only RE-LABEL them at
    their higher threshold against the regressed boxes — the paper does no
    resampling (regression raises the fg fraction naturally), which is
    exactly the static-shape-friendly choice.
  * Box regression is class-agnostic per stage (required for the box chain;
    the reference Detectron configuration) with per-stage delta
    normalization (10/20/30 schedule).
  * The box chain detaches between stages (each head trains on the previous
    stage's OUTPUT distribution, not through it) — gradients stay local to
    each stage, matching the paper.
  * Inference averages the per-stage class posteriors (the standard
    Detectron ensemble) and keeps the LAST stage's boxes, then runs the
    shared class-aware NMS tail.

Shares DetectorCore with the other two-stage families; stage 1 keeps the
plain ``det_head`` name and stages 2+ are ``det_head2``/``det_head3`` — the
"det_head" substring keeps the TP sharding rules and freeze prefixes
applying to every stage's MLP.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpudet.config import Config
from tpudet.models.faster_rcnn import DetectorCore, FasterRCNN
from tpudet.ops import boxes as box_ops
from tpudet.ops.matchers import match_boxes
from tpudet.train import losses as L


class CascadeRCNN(FasterRCNN):
    """Cascade of refinement heads over the shared two-stage machinery."""

    def __init__(self, cfg: Config):
        c = cfg.cascade
        t = len(c.stage_iou_thresholds)
        if t < 2:
            raise ValueError(
                "cascade.stage_iou_thresholds needs >= 2 stages "
                f"(got {c.stage_iou_thresholds}); use model='faster_rcnn' "
                "for a single head"
            )
        if len(c.stage_box_reg_weights) != t or len(c.stage_loss_weights) != t:
            raise ValueError(
                f"cascade stage lists disagree: {t} thresholds, "
                f"{len(c.stage_box_reg_weights)} box_reg_weights, "
                f"{len(c.stage_loss_weights)} loss_weights"
            )
        if list(c.stage_iou_thresholds) != sorted(c.stage_iou_thresholds):
            raise ValueError(
                "cascade.stage_iou_thresholds must be non-decreasing "
                f"(got {c.stage_iou_thresholds})"
            )
        if not cfg.roi.class_agnostic_bbox:
            raise ValueError(
                "model='cascade_rcnn' requires roi.class_agnostic_bbox=True: "
                "the box chain feeds each stage ONE refined box per proposal"
            )
        super().__init__(cfg)

    # ------------------------------------------------------------- training
    def _cascade_targets_single(
        self, iou_thresh, reg_weights, boxes, valid, gt_boxes, gt_classes,
        gt_valid,
    ):
        """Stage >= 2 re-labeling (paper §3.3, no resampling): fg at the
        stage threshold, bg below it (no ignore band — every kept RoI gets a
        label), rows invalidated by stage-1 sampling stay invalid."""
        iou = box_ops.pairwise_iou(boxes, gt_boxes)
        matched, labels = match_boxes(
            iou, iou_thresh, iou_thresh, gt_valid=gt_valid,
            allow_low_quality=False,
        )
        labels = jnp.where(valid, labels, -1)
        tgt_classes = jnp.where(
            labels == 1, gt_classes[matched], 0
        ).astype(jnp.int32)
        tgt_deltas = box_ops.encode_boxes(
            gt_boxes[matched], boxes, reg_weights
        )
        return tgt_classes, tgt_deltas, labels == 1, labels >= 0

    def _stage_head(self, variables, feats, boxes, stage: int, training: bool):
        """Pool the stage's boxes and run its head: [B, K, 4] ->
        (cls_logits [B, K, C+1], deltas [B, K, 1, 4])."""
        b, k = boxes.shape[:2]
        pooled = self._pool_batch(feats, boxes, training=training)
        pooled_flat = pooled.reshape((b * k,) + pooled.shape[2:])
        cls_logits, deltas = self.core.apply(
            variables, pooled_flat, method=DetectorCore.roi_head, stage=stage
        )
        return (
            cls_logits.reshape(b, k, -1),
            deltas.reshape(b, k, -1, 4),
        )

    def _refine_boxes(self, boxes, deltas, image_hw, reg_weights):
        """Class-agnostic chain step: decode each RoI's single delta set
        against its box, clip to the image. Detached — each stage trains on
        the previous stage's OUTPUT distribution, not through it."""
        refined = box_ops.decode_boxes(
            jax.lax.stop_gradient(deltas[:, :, 0, :]), boxes, reg_weights
        )
        return jax.vmap(box_ops.clip_boxes)(refined, image_hw)

    def loss(
        self, variables, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        if cfg.rpn_only:
            return super().loss(variables, batch, rng)
        images = batch["image"]
        b = images.shape[0]
        anchors = self.anchor_boxes(images.shape[1:3])

        feats = self.core.apply(
            variables, images, method=DetectorCore.features
        )
        rpn_logits, rpn_deltas = self.core.apply(
            variables, feats, method=DetectorCore.rpn
        )

        rng_rpn, rng_roi = jax.random.split(rng)
        metrics: Dict[str, jnp.ndarray] = {}
        if cfg.det_only:
            rpn_total = 0.0
        else:
            rpn_cls, rpn_box, num_pos = self._rpn_stage_losses(
                anchors, rpn_logits, rpn_deltas, batch, rng_rpn
            )
            rpn_total = rpn_cls + rpn_box
            metrics["rpn_cls_loss"] = rpn_cls
            metrics["rpn_box_loss"] = rpn_box
            metrics["num_pos_anchors"] = num_pos

        prop_boxes, _, prop_valid = self.proposals(
            rpn_logits, rpn_deltas, batch["image_hw"], training=True,
            canvas_hw=images.shape[1:3],
        )

        c = cfg.cascade
        # Stage 1: the shared balanced sampler (append-GT, bg-lo range) but
        # the cascade's stage-1 delta normalization.
        roi_keys = jax.random.split(rng_roi, b)
        boxes, tgt_cls, tgt_box, is_fg, roi_valid, _ = jax.vmap(
            functools.partial(
                self._roi_targets_single,
                reg_weights=c.stage_box_reg_weights[0],
            )
        )(prop_boxes, prop_valid, batch["gt_boxes"], batch["gt_classes"],
          batch["gt_valid"], roi_keys)

        total = rpn_total
        for t, (thresh, weights, lw) in enumerate(zip(
            c.stage_iou_thresholds, c.stage_box_reg_weights,
            c.stage_loss_weights,
        )):
            if t > 0:
                # Re-label the SAME static RoI set at the higher threshold.
                tgt_cls, tgt_box, is_fg, roi_valid = jax.vmap(
                    functools.partial(
                        self._cascade_targets_single, thresh,
                        jnp.asarray(weights),
                    )
                )(boxes, roi_valid, batch["gt_boxes"], batch["gt_classes"],
                  batch["gt_valid"])
            cls_logits, deltas = self._stage_head(
                variables, feats, boxes, stage=t, training=True
            )
            st_cls, st_box = jax.vmap(L.detection_losses)(
                cls_logits, deltas, tgt_cls, tgt_box, is_fg, roi_valid
            )
            st_cls, st_box = jnp.mean(st_cls), jnp.mean(st_box)
            total = total + lw * (st_cls + st_box)
            metrics[f"det_cls_loss_s{t + 1}"] = st_cls
            metrics[f"det_box_loss_s{t + 1}"] = st_box
            metrics[f"num_fg_rois_s{t + 1}"] = jnp.mean(
                jnp.sum(is_fg & roi_valid, axis=1).astype(jnp.float32)
            )
            if t + 1 < len(c.stage_iou_thresholds):
                boxes = self._refine_boxes(
                    boxes, deltas, batch["image_hw"], weights
                )
        metrics["loss"] = total
        return total, metrics

    # ----------------------------------------------------------- inference
    def predict(self, variables, batch: Dict[str, jnp.ndarray]):
        cfg = self.cfg
        if cfg.rpn_only:
            return super().predict(variables, batch)
        images = batch["image"]
        feats = self.core.apply(
            variables, images, method=DetectorCore.features
        )
        rpn_logits, rpn_deltas = self.core.apply(
            variables, feats, method=DetectorCore.rpn
        )
        boxes, _, prop_valid = self.proposals(
            rpn_logits, rpn_deltas, batch["image_hw"], training=False,
            canvas_hw=images.shape[1:3],
        )

        c = cfg.cascade
        probs_sum = None
        for t, weights in enumerate(c.stage_box_reg_weights):
            cls_logits, deltas = self._stage_head(
                variables, feats, boxes, stage=t, training=False
            )
            probs = jax.nn.softmax(cls_logits, axis=-1)
            probs_sum = probs if probs_sum is None else probs_sum + probs
            if t + 1 < len(c.stage_box_reg_weights):
                boxes = self._refine_boxes(
                    boxes, deltas, batch["image_hw"], weights
                )
            else:
                final_deltas = deltas

        # The Detectron ensemble: mean class posterior over stages, the
        # LAST stage's (class-agnostic) boxes; shared NMS tail.
        avg_fg_probs = (
            probs_sum / len(c.stage_iou_thresholds)
        )[:, :, 1:]  # [B, K, C]
        last_w = c.stage_box_reg_weights[-1]
        final_boxes = self._refine_boxes(
            boxes, final_deltas, batch["image_hw"], last_w
        )
        num_classes = cfg.data.num_classes
        final_pc = jnp.broadcast_to(
            final_boxes[:, :, None, :],
            final_boxes.shape[:2] + (num_classes, 4),
        )
        out_boxes, out_scores, out_classes, out_valid = jax.vmap(
            lambda bx, pr, pv: self._final_nms(bx, pr, pv)
        )(final_pc, avg_fg_probs, prop_valid)
        return {
            "boxes": out_boxes,
            "scores": out_scores,
            "classes": out_classes,
            "valid": out_valid,
            "num_detections": jnp.sum(out_valid, axis=1).astype(jnp.int32),
        }
