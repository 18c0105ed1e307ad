"""FCOS assembly (anchor-FREE single-stage family — a build extra beyond the
anchor-based TF2 reference, reusing the framework's backbone/FPN/NMS/eval
components; Tian et al., arXiv:1904.01355).

This is the most TPU-native of the four families: there are no anchors to
materialize at all (only a per-cell point grid — a trace-time constant), no
IoU matcher, and no sampling — the per-location assignment is one dense
static [points, gt] computation, and the box loss (1 − GIoU on decoded
boxes) removes the delta-encoding convention entirely. Every stage of both
the training and inference programs is static-shape by construction.

Conventions mirror ``retinanet.py``: one Flax module owns backbone + P3–P7 +
shared towers; levels concatenate in sorted name order (p3..p7); the batch
and detection dict contracts are identical to the other families, so the
trainer/evaluator/serving/CLIs stay model-agnostic via ``models.build_model``.

Variant notes (the widely-used "FCOS improvements" set, all config-gated):
centerness predicted from the REGRESSION tower (paper §4.1 ablation: better
than the classification tower), center-sampling candidate rule
(``fcos.center_sampling_radius``; 0 restores the paper's original
anywhere-inside-the-box rule), and centerness-weighted GIoU box loss.
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
from tpudet.train import losses as L


class FCOSHead(nn.Module):
    """Shared-across-levels towers (paper §3.1): ``num_convs`` 3x3 convs
    (+ GroupNorm) per tower; classification tower -> C logits (prior-prob
    bias init, same rationale as RetinaNet); regression tower -> 4 raw
    distances + 1 centerness logit. Raw distances are scaled per level by
    the caller (trainable scalar + stride), not here — the head itself is
    level-agnostic so its parameters are shared.

    Outputs flatten to [B, H*W, ...] row-major over (y, x), the exact order
    of ``ops.anchors.generate_points_np``."""

    num_classes: int
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        def tower(x, prefix):
            for i in range(self.num_convs):
                x = nn.Conv(
                    self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"{prefix}_conv{i}",
                )(x)
                if self.norm == "gn":
                    x = nn.GroupNorm(
                        num_groups=min(32, self.channels), dtype=self.dtype,
                        name=f"{prefix}_gn{i}",
                    )(x)
                x = nn.relu(x)
            return x

        cls = tower(feat, "cls")
        box = tower(feat, "box")
        bias = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        logits = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias),
            name="cls_logits",
        )(cls)
        raw_dists = nn.Conv(
            4, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="box_dists",
        )(box)
        # Centerness shares the regression tower (paper §4.1 ablation).
        ctr = nn.Conv(
            1, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="centerness",
        )(box)
        b = feat.shape[0]
        return (
            logits.reshape(b, -1, self.num_classes).astype(jnp.float32),
            raw_dists.reshape(b, -1, 4).astype(jnp.float32),
            ctr.reshape(b, -1).astype(jnp.float32),
        )


class FCOSCore(nn.Module):
    """Backbone + P3–P7 pyramid + shared head + per-level trainable scales."""

    cfg: Config

    def setup(self):
        bb = self.cfg.backbone
        dtype = jnp.bfloat16 if bb.dtype == "bfloat16" else jnp.float32
        self.backbone = build_backbone(
            bb.name, bb.norm, dtype, bb.freeze_stem, s2d_stem=bb.s2d_stem,
            remat=bb.remat, stride_in_1x1=bb.stride_in_1x1,
        )
        self.fpn = RetinaNetFPN(dtype=dtype)
        f = self.cfg.fcos
        self.head = FCOSHead(
            num_classes=self.cfg.data.num_classes,
            num_convs=f.num_convs,
            channels=f.head_channels,
            prior_prob=f.prior_prob,
            norm=f.head_norm,
            dtype=dtype,
        )
        # One trainable scalar per level on the raw distances (paper §3.2:
        # exp(s_i x) lets the shared head specialize per level).
        self.level_scales = self.param(
            "level_scales",
            lambda key, n: jnp.ones((n,), jnp.float32),
            len(self.cfg.anchors.fpn_strides),
        )

    def features(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.fpn(self.backbone(images))

    def heads(self, feats: Dict[str, jnp.ndarray]):
        """Shared head over levels (sorted name order == stride order);
        raw distances -> ABSOLUTE pixel distances via
        ``exp(clip(s_l * raw)) * stride_l`` — σ=0.01-initialized raw outputs
        start the distances at ≈ stride (scale-appropriate per level), and
        the clip bounds the exp so an early training spike cannot emit an
        inf box into the GIoU loss."""
        strides = self.cfg.anchors.fpn_strides
        logits_all, dists_all, ctr_all = [], [], []
        for i, name in enumerate(sorted(feats.keys())):
            logits, raw, ctr = self.head(feats[name])
            scaled = jnp.clip(self.level_scales[i] * raw, -8.0, 8.0)
            dists_all.append(jnp.exp(scaled) * strides[i])
            logits_all.append(logits)
            ctr_all.append(ctr)
        return (
            jnp.concatenate(logits_all, axis=1),
            jnp.concatenate(dists_all, axis=1),
            jnp.concatenate(ctr_all, axis=1),
        )

    def __call__(self, images):  # parameter init only
        return self.heads(self.features(images))


def _boxes_from_dists(points: jnp.ndarray, dists: jnp.ndarray) -> jnp.ndarray:
    """Decode (l, t, r, b) distances at (x, y) points into x1y1x2y2 boxes."""
    x, y = points[..., 0], points[..., 1]
    l, t, r, b = dists[..., 0], dists[..., 1], dists[..., 2], dists[..., 3]
    return jnp.stack([x - l, y - t, x + r, y + b], axis=-1)


class FCOS:
    """Pipeline orchestrator: the same ``init`` / ``loss`` / ``predict``
    surface as the other families."""

    def __init__(self, cfg: Config):
        if cfg.rpn_only or cfg.det_only:
            raise ValueError(
                "rpn_only/det_only are two-stage (Faster R-CNN) training "
                "modes; FCOS has neither an RPN nor a second stage"
            )
        if not cfg.backbone.use_fpn:
            raise ValueError(
                "model='fcos' requires backbone.use_fpn=True "
                "(the detector is defined on a P3-P7 pyramid)"
            )
        if tuple(cfg.anchors.fpn_strides) != (8, 16, 32, 64, 128):
            # The point grid, per-point strides, and exp-decode scaling all
            # key on anchors.fpn_strides, but the RetinaNetFPN pyramid is
            # FIXED at P3-P7 — a default AnchorConfig (strides 4..64) would
            # pass the bounds-length check below and then die in an opaque
            # broadcast error (or silently mis-scale) far from the cause.
            raise ValueError(
                "model='fcos' runs on the fixed P3-P7 pyramid: set "
                "anchors.fpn_strides=(8, 16, 32, 64, 128) "
                f"(got {cfg.anchors.fpn_strides})"
            )
        if len(cfg.fcos.regress_range_bounds) != len(cfg.anchors.fpn_strides) - 1:
            raise ValueError(
                f"fcos.regress_range_bounds needs len(fpn_strides)-1 = "
                f"{len(cfg.anchors.fpn_strides) - 1} bounds, got "
                f"{len(cfg.fcos.regress_range_bounds)}"
            )
        self.cfg = cfg
        self.core = FCOSCore(cfg)
        # (points [N,2], stride [N], range_lo [N], range_hi [N], level sizes)
        self._points_cache: Dict[Tuple[int, int], tuple] = {}

    # -------------------------------------------------------------- points
    def point_grid(self, canvas_hw: Tuple[int, int] | None = None):
        """Trace-time constants over the static canvas: concatenated
        per-level point grid plus each point's stride and regression range
        (paper §3.2's m_{i-1} < max(l,t,r,b) <= m_i level assignment),
        cached per canvas shape like the anchor grids."""
        if canvas_hw is None:
            canvas_hw = (self.cfg.data.canvas_height, self.cfg.data.canvas_width)
        h, w = int(canvas_hw[0]), int(canvas_hw[1])
        if (h, w) not in self._points_cache:
            strides = self.cfg.anchors.fpn_strides
            bounds = (
                (0.0,) + tuple(self.cfg.fcos.regress_range_bounds)
                + (float("inf"),)
            )
            pts, str_c, lo_c, hi_c, sizes = [], [], [], [], []
            ceil = lambda n, s: -(-n // s)  # noqa: E731
            for i, s in enumerate(strides):
                p = anchor_ops.generate_points_np(ceil(h, s), ceil(w, s), s)
                pts.append(p)
                n = p.shape[0]
                sizes.append(n)
                str_c.append(np.full((n,), s, np.float32))
                lo_c.append(np.full((n,), bounds[i], np.float32))
                hi_c.append(np.full((n,), bounds[i + 1], np.float32))
            self._points_cache[(h, w)] = (
                np.concatenate(pts, axis=0),
                np.concatenate(str_c, axis=0),
                np.concatenate(lo_c, axis=0),
                np.concatenate(hi_c, axis=0),
                sizes,
            )
        pts, stc, lo, hi, sizes = self._points_cache[(h, w)]
        return (
            jnp.asarray(pts), jnp.asarray(stc), jnp.asarray(lo),
            jnp.asarray(hi), sizes,
        )

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        h, w = self.cfg.data.canvas_height, self.cfg.data.canvas_width
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        return self.core.init(rng, dummy)

    # ---------------------------------------------------------------- loss
    def _targets_single(
        self, points, point_stride, range_lo, range_hi,
        gt_boxes, gt_classes, gt_valid,
    ):
        """Dense per-location assignment (paper §3.2), fully static:
        candidate(point, gt) = inside the GT (or its center-sampling
        sub-box) AND max distance within the point's level range AND the GT
        is real; ties resolve to the minimal-area GT. No matcher, no
        sampling — every location gets a label."""
        f = self.cfg.fcos
        px, py = points[:, 0:1], points[:, 1:2]              # [N, 1]
        x1, y1 = gt_boxes[None, :, 0], gt_boxes[None, :, 1]  # [1, G]
        x2, y2 = gt_boxes[None, :, 2], gt_boxes[None, :, 3]
        l, t = px - x1, py - y1                              # [N, G]
        r, b = x2 - px, y2 - py
        inside = (
            (jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b))) > 0.0
        )
        max_dist = jnp.maximum(jnp.maximum(l, r), jnp.maximum(t, b))
        in_range = (max_dist > range_lo[:, None]) & (
            max_dist <= range_hi[:, None]
        )
        candidate = inside & in_range & gt_valid[None, :]
        if f.center_sampling_radius > 0:
            cx = 0.5 * (x1 + x2)
            cy = 0.5 * (y1 + y2)
            rad = f.center_sampling_radius * point_stride[:, None]  # [N, 1]
            near = (jnp.abs(px - cx) <= rad) & (jnp.abs(py - cy) <= rad)
            candidate = candidate & near

        areas = box_ops.area(gt_boxes)[None, :]              # [1, G]
        masked = jnp.where(candidate, areas, jnp.inf)
        matched = jnp.argmin(masked, axis=1)                 # [N]
        pos = jnp.any(candidate, axis=1)

        tgt_classes = jnp.where(pos, gt_classes[matched], 0)
        tgt_boxes = gt_boxes[matched]                        # [N, 4]
        # Centerness target from the matched box's distances (paper Eq. 3).
        ml = px[:, 0] - tgt_boxes[:, 0]
        mt = py[:, 0] - tgt_boxes[:, 1]
        mr = tgt_boxes[:, 2] - px[:, 0]
        mb = tgt_boxes[:, 3] - py[:, 0]
        eps = 1e-9
        ctr = jnp.sqrt(
            jnp.clip(
                (jnp.minimum(ml, mr) / jnp.maximum(jnp.maximum(ml, mr), eps))
                * (jnp.minimum(mt, mb) / jnp.maximum(jnp.maximum(mt, mb), eps)),
                0.0, 1.0,
            )
        )
        tgt_ctr = jnp.where(pos, ctr, 0.0)
        return tgt_classes, tgt_boxes, tgt_ctr, pos

    def loss(
        self, variables, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training forward: one jittable static-shape program. ``rng`` is
        accepted for trainer-API parity but unused (no sampling)."""
        del rng
        cfg = self.cfg
        images = batch["image"]
        points, stride_c, lo_c, hi_c, _ = self.point_grid(images.shape[1:3])

        feats = self.core.apply(variables, images, method=FCOSCore.features)
        cls_logits, dists, ctr_logits = self.core.apply(
            variables, feats, method=FCOSCore.heads
        )
        pred_boxes = _boxes_from_dists(points[None], dists)  # [B, N, 4]

        tgt_classes, tgt_boxes, tgt_ctr, pos = jax.vmap(
            functools.partial(
                self._targets_single, points, stride_c, lo_c, hi_c
            )
        )(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

        f = cfg.fcos
        cls_loss, box_loss, ctr_loss = jax.vmap(
            functools.partial(
                L.fcos_losses,
                alpha=f.focal_alpha, gamma=f.focal_gamma,
                box_weight=f.loss_weight_box, ctr_weight=f.loss_weight_ctr,
            )
        )(cls_logits, pred_boxes, ctr_logits, tgt_classes, tgt_boxes,
          tgt_ctr, pos)
        cls_loss = jnp.mean(cls_loss)
        box_loss = jnp.mean(box_loss)
        ctr_loss = jnp.mean(ctr_loss)
        total = cls_loss + box_loss + ctr_loss
        return total, {
            "loss": total,
            "focal_cls_loss": cls_loss,
            "giou_box_loss": box_loss,
            "centerness_loss": ctr_loss,
            "num_pos_points": jnp.mean(
                jnp.sum(pos.astype(jnp.float32), axis=1)
            ),
        }

    # ----------------------------------------------------------- inference
    def _predict_single(self, points, level_sizes, cls_logits, dists,
                        ctr_logits, image_hw):
        """Per-image postprocess (paper §3.1): per level, top-k over the
        flattened (location, class) centerness-weighted scores above
        score_thresh; decode only those k; one class-aware NMS over the
        level union. The candidate score is sigmoid(cls) * sigmoid(ctr) —
        centerness downweights low-quality border predictions before NMS."""
        f = self.cfg.fcos
        num_classes = self.cfg.data.num_classes
        boxes_l, scores_l, classes_l, valid_l = [], [], [], []
        offset = 0
        for n in level_sizes:
            lvl_scores = (
                jax.nn.sigmoid(cls_logits[offset:offset + n])
                * jax.nn.sigmoid(ctr_logits[offset:offset + n])[:, None]
            ).reshape(-1)  # [n*C]
            k = min(f.pre_nms_topk, lvl_scores.shape[0])
            top_scores, flat_idx = selection.blocked_top_k(lvl_scores, k)
            point_idx = offset + flat_idx // num_classes
            cls_idx = (flat_idx % num_classes).astype(jnp.int32)
            decoded = _boxes_from_dists(points[point_idx], dists[point_idx])
            boxes_l.append(box_ops.clip_boxes(decoded, image_hw))
            scores_l.append(top_scores)
            classes_l.append(cls_idx + 1)  # 1..C (0 = background/invalid)
            valid_l.append(top_scores > f.score_thresh)
            offset += n

        boxes = jnp.concatenate(boxes_l, axis=0)
        scores = jnp.concatenate(scores_l, axis=0)
        classes = jnp.concatenate(classes_l, axis=0)
        valid = jnp.concatenate(valid_l, axis=0)

        from tpudet.models.faster_rcnn import _nms_offset

        keep, out_scores, keep_valid = class_aware_select(
            boxes, scores, classes, f.nms_thresh, f.max_detections,
            valid_mask=valid, method=f.nms_method, sigma=f.soft_nms_sigma,
            prune_threshold=f.score_thresh, use_pallas=self.cfg.use_pallas,
            coordinate_offset=_nms_offset(self.cfg),
        )
        return (
            boxes[keep],
            out_scores,
            jnp.where(keep_valid, classes[keep], 0),
            keep_valid,
        )

    def predict(self, variables, batch: Dict[str, jnp.ndarray]):
        """Inference forward: the framework's detection dict contract
        (boxes [B, D, 4] canvas coords, scores, classes 1..C, valid,
        num_detections), same as the other families."""
        images = batch["image"]
        points, _, _, _, level_sizes = self.point_grid(images.shape[1:3])
        feats = self.core.apply(variables, images, method=FCOSCore.features)
        cls_logits, dists, ctr_logits = self.core.apply(
            variables, feats, method=FCOSCore.heads
        )
        boxes, scores, classes, valid = jax.vmap(
            functools.partial(self._predict_single, points, level_sizes)
        )(cls_logits, dists, ctr_logits, batch["image_hw"])
        return {
            "boxes": boxes,
            "scores": scores,
            "classes": classes,
            "valid": valid,
            "num_detections": jnp.sum(valid, axis=1).astype(jnp.int32),
        }
