"""Faster R-CNN assembly (SURVEY.md C5–C16 wired together; reference call
stacks 3a/3b).

Design (TPU-first, not a translation of the TF2 reference):
  * ``DetectorCore`` — one Flax module owning backbone / FPN / RPN head /
    detection head so all parameters live in a single tree that shards
    cleanly over a mesh.
  * All pipeline geometry (proposal generation, target assignment, pooling,
    post-processing) is pure static-shape jnp from ``tpudet.ops``, vmapped
    over the batch; the whole forward/loss is one jit-compiled program — no
    host round-trips inside the step.
  * Dynamic-count quantities (proposals, detections, samples) are fixed-size
    arrays + validity masks everywhere.

Batch dict contract (produced by ``tpudet.data``):
  image      [B, H, W, 3] float32, normalized, padded to the static canvas
  image_hw   [B, 2] float32 — valid (height, width) region after resize
  gt_boxes   [B, G, 4] float32 (x1, y1, x2, y2), padded
  gt_classes [B, G] int32 in 1..C (0 reserved for background)
  gt_valid   [B, G] bool
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpudet.config import Config
from tpudet.models.resnet import build_backbone
from tpudet.models.fpn import FPN
from tpudet.models.rpn_head import RPNHead
from tpudet.models.det_head import FastRCNNHead
from tpudet.ops import boxes as box_ops
from tpudet.ops import anchors as anchor_ops
from tpudet.ops import selection
from tpudet import kernels
from tpudet.kernels import (
    batched_nms_dispatch,
    class_aware_select,
    nms_dispatch,
)
from tpudet.ops.matchers import match_boxes
from tpudet.ops.samplers import sample_balanced
from tpudet.ops.roi_align import (
    crop_and_resize,
    fpn_assign_levels,
    roi_align,
    roi_align_mxu,
    roi_align_window,
    roi_align_window_train,
)
from tpudet.train import losses as L

# Default cap on flattened (box, class) candidates entering the final
# per-class NMS (overridable via ROIConfig.max_nms_candidates); top-k-ed by
# score first so the sequential NMS loop stays short on TPU.
MAX_NMS_CANDIDATES = 1024


def _max_canvas_dim(cfg: Config) -> int:
    """Largest canvas side this config can produce (aspect buckets override
    the single canvas; canvas_short is a short side by definition)."""
    d = cfg.data
    if d.aspect_buckets:
        return max(max(h, w) for h, w in d.aspect_buckets)
    return max(d.canvas_height, d.canvas_width)


def _nms_offset(cfg: Config) -> float:
    """Class/level coordinate-offset stride for batched NMS, derived from
    the largest canvas this config can produce (boxes are clipped to the
    canvas, so this bounds every coordinate — large-imagery configs with
    canvases > 4096 would otherwise silently overlap offset bands)."""
    from tpudet.ops.nms import coordinate_offset_for

    return coordinate_offset_for(float(_max_canvas_dim(cfg)))


class DetectorCore(nn.Module):
    """Backbone + (optional) FPN + RPN head + Fast R-CNN head."""

    cfg: Config

    def setup(self):
        bb = self.cfg.backbone
        dtype = jnp.bfloat16 if bb.dtype == "bfloat16" else jnp.float32
        from tpudet.models.vit import VIT_VARIANTS

        is_vit = bb.name in VIT_VARIANTS
        if is_vit:
            from tpudet.models.vit import build_vit

            if not bb.use_fpn:
                raise ValueError(
                    "ViTDet backbones are defined with the simple feature "
                    "pyramid (p2-p6): set backbone.use_fpn=True"
                )
            self.backbone = build_vit(bb.name, bb, dtype)
        else:
            self.backbone = build_backbone(
                bb.name, bb.norm, dtype, bb.freeze_stem,
                s2d_stem=bb.s2d_stem, remat=bb.remat,
                stride_in_1x1=bb.stride_in_1x1,
            )
        if bb.use_fpn:
            # ViTDet's pyramid is built from the single stride-16 map
            # (arXiv:2203.16527: no lateral/top-down pathway); both emit the
            # same p2-p6/256ch dict, so everything downstream is shared.
            if is_vit:
                from tpudet.models.vit import SimpleFeaturePyramid

                self.fpn = SimpleFeaturePyramid(dtype=dtype)
            else:
                self.fpn = FPN(dtype=dtype)
            num_anchors = self.cfg.anchors.num_fpn_anchors_per_cell
        else:
            num_anchors = self.cfg.anchors.num_anchors_per_cell
            if bb.neck_channels > 0:
                self.neck = nn.Sequential([
                    nn.Conv(bb.neck_channels, (1, 1), dtype=dtype,
                            name="neck_conv"),
                    nn.relu,
                ])
        self.rpn_head = RPNHead(
            num_anchors=num_anchors,
            conv_channels=self.cfg.rpn.conv_channels,
            dtype=dtype,
        )
        self.det_head = FastRCNNHead(
            num_classes=self.cfg.data.num_classes,
            fc_dim=self.cfg.roi.fc_dim,
            class_agnostic=self.cfg.roi.class_agnostic_bbox,
            dtype=dtype,
        )
        if self.cfg.model == "cascade_rcnn":
            # Stages 2..T get their own heads; names keep the "det_head"
            # substring so the TP sharding rules (and freeze prefixes like
            # 'det_head2') apply to every stage's MLP, and stage 1 keeps the
            # plain det_head name for warm-start compat with faster_rcnn
            # checkpoints.
            self.cascade_heads = tuple(
                FastRCNNHead(
                    num_classes=self.cfg.data.num_classes,
                    fc_dim=self.cfg.roi.fc_dim,
                    class_agnostic=True,
                    dtype=dtype,
                    name=f"det_head{t + 1}",
                )
                for t in range(1, len(self.cfg.cascade.stage_iou_thresholds))
            )
        if self.cfg.model in ("mask_rcnn", "panoptic_fpn"):
            from tpudet.models.mask_head import MaskHead

            m = self.cfg.mask
            self.mask_head = MaskHead(
                num_classes=1 if m.class_agnostic
                else self.cfg.data.num_classes,
                num_convs=m.num_convs,
                channels=m.conv_channels,
                dtype=dtype,
            )
        if self.cfg.model == "panoptic_fpn":
            from tpudet.models.semantic_head import SemanticHead

            pc = self.cfg.panoptic
            self.semantic_head = SemanticHead(
                num_classes=(self.cfg.data.num_stuff_classes
                             + self.cfg.data.num_classes),
                channels=pc.conv_channels,
                dtype=dtype,
            )
        if self.cfg.model == "keypoint_rcnn":
            from tpudet.models.keypoint_head import KeypointHead

            kc = self.cfg.keypoint
            self.keypoint_head = KeypointHead(
                num_keypoints=self.cfg.data.num_keypoints,
                num_convs=kc.num_convs,
                channels=kc.conv_channels,
                dtype=dtype,
            )

    def features(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats = self.backbone(images)
        if self.cfg.backbone.use_fpn:
            return self.fpn(feats)
        c4 = feats["c4"]
        if self.cfg.backbone.neck_channels > 0:
            c4 = self.neck(c4)
        return {"c4": c4}

    def rpn(self, feats: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Shared RPN head over levels; outputs concatenated in level order
        (sorted by stride — matches ``generate_fpn_anchors``)."""
        logits_all, deltas_all = [], []
        for name in sorted(feats.keys()):
            logits, deltas = self.rpn_head(feats[name])
            logits_all.append(logits)
            deltas_all.append(deltas)
        return jnp.concatenate(logits_all, axis=1), jnp.concatenate(deltas_all, axis=1)

    def roi_head(
        self, pooled: jnp.ndarray, stage: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if stage == 0:
            return self.det_head(pooled)
        return self.cascade_heads[stage - 1](pooled)

    def masks(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """Mask FCN over [N, s_m, s_m, C_feat] -> [N, 2*s_m, 2*s_m, C]."""
        return self.mask_head(pooled)

    def keypoints(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """Keypoint FCN over [N, s_k, s_k, C_feat] -> [N, 4*s_k, 4*s_k, K]."""
        return self.keypoint_head(pooled)

    def semantic(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Panoptic semantic FCN: {p2..p5} -> [B, H/4, W/4, S + C] logits."""
        return self.semantic_head(feats)

    def __call__(self, images):  # used for parameter init only
        feats = self.features(images)
        logits, deltas = self.rpn(feats)
        any_feat = next(iter(feats.values()))
        s = self.cfg.roi.output_size
        dummy = jnp.zeros((1, s, s, any_feat.shape[-1]), any_feat.dtype)
        if self.cfg.model in ("mask_rcnn", "panoptic_fpn"):
            sm = self.cfg.mask.roi_output_size
            self.masks(
                jnp.zeros((1, sm, sm, any_feat.shape[-1]), any_feat.dtype)
            )
        if self.cfg.model == "panoptic_fpn":
            self.semantic(feats)
        if self.cfg.model == "keypoint_rcnn":
            sk = self.cfg.keypoint.roi_output_size
            self.keypoints(
                jnp.zeros((1, sk, sk, any_feat.shape[-1]), any_feat.dtype)
            )
        if self.cfg.model == "cascade_rcnn":
            for t in range(1, len(self.cfg.cascade.stage_iou_thresholds)):
                self.roi_head(dummy, stage=t)
        return self.roi_head(dummy)


class FasterRCNN:
    """Pipeline orchestrator: pure functions over (variables, batch)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.core = DetectorCore(cfg)
        self._anchors_cache: Dict[Tuple[int, int], np.ndarray] = {}
        if cfg.rpn.topk_method not in ("exact", "blocked", "approx"):
            # Dispatch falls through to exact on no match, so a typo'd value
            # would otherwise be silently inert (and "benchmarks" of it
            # would measure exact twice).
            raise ValueError(
                f"rpn.topk_method={cfg.rpn.topk_method!r}: expected 'exact', "
                "'blocked', or 'approx'"
            )
        if cfg.rpn_only and cfg.det_only:
            raise ValueError(
                "rpn_only and det_only are mutually exclusive training modes"
            )
        if cfg.roi.pooler == "roi_align_window" and cfg.backbone.use_fpn:
            max_dim = _max_canvas_dim(cfg)
            # The windowed pooler's precondition: even a canvas-sized RoI
            # must fit a tile at the coarsest pooling level (p5, stride 32).
            if max_dim / 32.0 > cfg.roi.window - 12:
                raise ValueError(
                    f"roi.window={cfg.roi.window} too small for canvases up "
                    f"to {max_dim}px: need window >= "
                    f"{int(-(-max_dim // 32)) + 12} so p5-level RoIs fit "
                    "(or use pooler='roi_align')"
                )

    # ------------------------------------------------------------- anchors
    @property
    def feature_strides(self) -> Tuple[int, ...]:
        if self.cfg.backbone.use_fpn:
            return tuple(self.cfg.anchors.fpn_strides)
        return (self.cfg.anchors.stride,)

    def anchor_boxes(self, canvas_hw: Tuple[int, int] | None = None) -> jnp.ndarray:
        """[N, 4] all anchors over the (static) canvas ``canvas_hw``.

        Keyed per canvas shape: with orientation-bucketed canvases the model
        traces once per (landscape, portrait) shape and each trace folds its
        own anchor constant. The cache holds host NumPy arrays; the jnp
        conversion happens per call so each jit trace stages its own constant
        (caching a traced array would leak tracers across transformations).
        """
        if canvas_hw is None:
            canvas_hw = (self.cfg.data.canvas_height, self.cfg.data.canvas_width)
        h, w = int(canvas_hw[0]), int(canvas_hw[1])
        if (h, w) not in self._anchors_cache:
            a = self.cfg.anchors
            # SAME-padded stride-2 convs produce ceil(h/stride) spatial dims
            # (nested ceils collapse: ceil(ceil(h/a)/b) == ceil(h/(a*b))), so
            # the anchor grid must use ceil too — floor would desync the
            # anchor count from the RPN output on canvases not divisible by
            # the full stride product (e.g. the 832x1120 COCO bucket at
            # FPN p6 stride 64).
            ceil = lambda n, s: -(-n // s)  # noqa: E731
            if self.cfg.backbone.use_fpn:
                shapes = [(ceil(h, s), ceil(w, s)) for s in a.fpn_strides]
                per_level = [
                    anchor_ops.generate_anchors_np(
                        fh, fw, s, [sc * o for o in a.fpn_octave_scales],
                        a.aspect_ratios,
                    )
                    for (fh, fw), s, sc in zip(shapes, a.fpn_strides, a.fpn_scales)
                ]
                self._anchors_cache[(h, w)] = np.concatenate(per_level, axis=0)
            else:
                self._anchors_cache[(h, w)] = anchor_ops.generate_anchors_np(
                    ceil(h, a.stride), ceil(w, a.stride), a.stride,
                    a.scales, a.aspect_ratios
                )
        return jnp.asarray(self._anchors_cache[(h, w)])

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        h, w = self.cfg.data.canvas_height, self.cfg.data.canvas_width
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        return self.core.init(rng, dummy)

    # ------------------------------------------------------- proposal path
    def _pre_nms_topk(self, scores, k, training):
        """Pre-NMS top-k dispatch (C10).

        - ``rpn.topk_method="blocked"`` routes through
          :func:`tpudet.ops.selection.blocked_top_k` — exact, bit-identical
          to ``lax.top_k`` including tie order (see that module's proof), so
          it applies in training AND inference.
        - ``rpn.topk_method="approx"`` routes inference through
          ``lax.approx_max_k`` (TPU PartialReduce partial selection at
          ``rpn.topk_recall_target``) — a serving-only approximation;
          training and the eval CLI always select exactly.
        """
        cfg = self.cfg.rpn
        if cfg.topk_method == "blocked":
            return selection.blocked_top_k(
                scores, k, block_size=cfg.topk_block_size
            )
        if cfg.topk_method == "approx" and not training and k < scores.shape[0]:
            return jax.lax.approx_max_k(
                scores, k, recall_target=cfg.topk_recall_target
            )
        return jax.lax.top_k(scores, k)

    def _generate_proposals_single(
        self,
        anchors: jnp.ndarray,
        logits: jnp.ndarray,
        deltas: jnp.ndarray,
        image_hw: jnp.ndarray,
        training: bool,
    ):
        """Per-image C10: decode -> clip -> min-size -> top-k -> NMS."""
        cfg = self.cfg.rpn
        n = anchors.shape[0]
        k_pre = min(n, cfg.pre_nms_topk_train if training else cfg.pre_nms_topk_test)
        k_post = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test

        # Select on raw logits (sigmoid is strictly monotone, so the top-k
        # set and its order are identical) and sigmoid only the k survivors.
        top_logits, idx = self._pre_nms_topk(logits, k_pre, training)
        top_scores = jax.nn.sigmoid(top_logits)
        if n <= 4 * k_pre:
            # Decode ALL anchors, then gather once: decode is cheap
            # elementwise VPU work, while each [k, 4] gather from the anchor
            # grid is scatter/gather-bound — one gather of decoded boxes
            # beats two gathers (deltas + anchors) feeding a post-gather
            # decode (profiled: +1.7% e2e at VOC's 14.4k anchors, b=32).
            decoded = box_ops.decode_boxes(deltas, anchors, cfg.box_reg_weights)
            boxes = box_ops.clip_boxes(decoded[idx], image_hw)
        else:
            # FPN-scale anchor counts (~173k at 832²) flip the tradeoff:
            # decoding 29x more boxes than survive top-k measured
            # +8 ms/batch at b=32, while the two [k, 4] gathers are noise.
            decoded = box_ops.decode_boxes(
                deltas[idx], anchors[idx], cfg.box_reg_weights
            )
            boxes = box_ops.clip_boxes(decoded, image_hw)
        wh = boxes[:, 2:] - boxes[:, :2]
        size_ok = (wh[:, 0] > cfg.min_box_size) & (wh[:, 1] > cfg.min_box_size)
        keep_idx, valid = nms_dispatch(
            boxes, top_scores, cfg.nms_thresh, k_post, valid_mask=size_ok,
            use_pallas=self.cfg.use_pallas,
            presorted=True,  # top_k output above is descending
        )
        return boxes[keep_idx], top_scores[keep_idx], valid

    def anchor_level_sizes(self, canvas_hw: Tuple[int, int] | None = None):
        """Per-FPN-level anchor counts, matching ``anchor_boxes``'s
        level-order concatenation (ceil grid dims × anchors/cell)."""
        if canvas_hw is None:
            canvas_hw = (self.cfg.data.canvas_height, self.cfg.data.canvas_width)
        h, w = int(canvas_hw[0]), int(canvas_hw[1])
        a = self.cfg.anchors
        per_cell = a.num_fpn_anchors_per_cell
        return [(-(-h // s)) * (-(-w // s)) * per_cell for s in a.fpn_strides]

    def _generate_proposals_single_fpn(
        self, anchors, level_sizes, logits, deltas, image_hw, training
    ):
        """Per-image C10, FPN protocol (FPN paper / Detectron): top-k per
        level, NMS within each level (via the level-offset batched NMS),
        post-NMS top-N across the union by score."""
        cfg = self.cfg.rpn
        k_level = (cfg.fpn_pre_nms_topk_per_level_train if training
                   else cfg.fpn_pre_nms_topk_per_level_test)
        k_post = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test

        cand_boxes, cand_scores, cand_levels = [], [], []
        start = 0
        for li, n_l in enumerate(level_sizes):
            sl = slice(start, start + n_l)
            start += n_l
            # Top-k on raw logits (monotone sigmoid after selection).
            top_l, idx = self._pre_nms_topk(
                logits[sl], min(n_l, k_level), training
            )
            top = jax.nn.sigmoid(top_l)
            dec = box_ops.decode_boxes(
                deltas[sl][idx], anchors[sl][idx], cfg.box_reg_weights
            )
            cand_boxes.append(box_ops.clip_boxes(dec, image_hw))
            cand_scores.append(top)
            cand_levels.append(jnp.full(top.shape, li + 1, jnp.int32))
        boxes = jnp.concatenate(cand_boxes)
        top_scores = jnp.concatenate(cand_scores)
        levels = jnp.concatenate(cand_levels)
        # Pad the candidate list to a multiple of 512 (the NMS kernel's
        # cross-tile row block): a ragged total (e.g. 4507 when P6 has
        # fewer anchors than the per-level top-k) is both tile-unfriendly
        # and was observed to crash the TPU worker on this stack when the
        # ragged-count NMS call was embedded in the full detection program.
        pad = (-boxes.shape[0]) % 512
        if pad:
            boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
            top_scores = jnp.concatenate(
                [top_scores, jnp.full((pad,), -1.0, top_scores.dtype)]
            )
            levels = jnp.concatenate(
                [levels, jnp.zeros((pad,), levels.dtype)]
            )
        wh = boxes[:, 2:] - boxes[:, :2]
        size_ok = (wh[:, 0] > cfg.min_box_size) & (wh[:, 1] > cfg.min_box_size)
        keep_idx, valid = batched_nms_dispatch(
            boxes, top_scores, levels, cfg.nms_thresh, k_post,
            valid_mask=size_ok, use_pallas=self.cfg.use_pallas,
            coordinate_offset=_nms_offset(self.cfg),
        )
        return (boxes[keep_idx],
                jnp.where(valid, top_scores[keep_idx], 0.0), valid)

    def proposals(self, logits, deltas, image_hw, training, canvas_hw=None):
        """Batched proposal generation. Gradients are stopped — proposal
        coordinates are treated as data by the second stage (standard)."""
        anchors = self.anchor_boxes(canvas_hw)
        if (self.cfg.backbone.use_fpn
                and self.cfg.rpn.fpn_pre_nms_topk_per_level_test > 0):
            fn = functools.partial(
                self._generate_proposals_single_fpn, anchors,
                self.anchor_level_sizes(canvas_hw), training=training,
            )
        else:
            fn = functools.partial(
                self._generate_proposals_single, anchors, training=training
            )
        boxes, scores, valid = jax.vmap(fn)(
            jax.lax.stop_gradient(logits), jax.lax.stop_gradient(deltas), image_hw
        )
        return boxes, scores, valid

    # ------------------------------------------------------------- pooling
    def _pool_one_level(self, feat, fboxes, out_size=None):
        """One level's RoI features via the configured backend (C12).

        ``out_size`` overrides ``roi.output_size`` (the mask branch pools the
        same features at a finer resolution — Mask R-CNN §3)."""
        roi = self.cfg.roi
        s = out_size or roi.output_size
        if roi.pooler == "crop_and_resize":
            return crop_and_resize(feat, fboxes, s)
        if roi.pooler == "roi_align_gather":
            return roi_align(feat, fboxes, s, roi.sampling_ratio)
        if roi.pooler == "roi_align_pallas":
            from tpudet.kernels.roi_align import roi_align_pallas

            interpret = not kernels.on_tpu_lowering()
            return roi_align_pallas(
                feat, fboxes, s, roi.sampling_ratio, interpret=interpret,
            )
        return roi_align_mxu(feat, fboxes, s, roi.sampling_ratio)

    def _pool_batch(self, feats: Dict[str, jnp.ndarray], rois: jnp.ndarray,
                    training: bool = False, out_size: int | None = None):
        """Batch-level C12 pooling: feats ``[B, H, W, C]`` per level, rois
        ``[B, N, 4]`` → ``[B, N, s, s, C]``.

        When the windowed Pallas pooler is eligible (FPN on a TPU lowering)
        AND ``roi.window_batched`` is set, pools ALL ``B*N`` RoIs in ONE
        ``pallas_call``; otherwise (the DEFAULT) ``jax.vmap`` over the
        per-image kernel, which lowers to a per-image ``while`` loop around
        a B=1 grid. Adjudicated on the chip round 4: the vmap formulation
        measured 259.13 img/s/chip vs the batched grid's 243.43/244.40
        (coco_r101_fpn b=32) — the round-3 "~2.2 ms scaffolding" prediction
        was wrong on hardware (KERNELS.md "Batched windowed pooler —
        adjudicated")."""
        roi = self.cfg.roi
        if (self.cfg.backbone.use_fpn and roi.pooler == "roi_align_window"
                and roi.window_batched
                and self.cfg.use_pallas and kernels.on_tpu_lowering()):
            level_feats = [feats[f"p{l}"] for l in (2, 3, 4, 5)]
            strides = (4.0, 8.0, 16.0, 32.0)
            if training:
                # Batched train entry: Pallas windowed forward over the one
                # flat grid, masked-sum-transpose backward (custom VJP).
                from tpudet.ops.roi_align import (
                    roi_align_window_train_batched,
                )

                return roi_align_window_train_batched(
                    level_feats, strides, rois,
                    out_size or roi.output_size, roi.sampling_ratio,
                    window=roi.window,
                )
            from tpudet.kernels.roi_align_window import (
                roi_align_window_pallas_batched,
            )

            k = jax.vmap(
                functools.partial(fpn_assign_levels, fit_window=roi.window)
            )(rois)
            return roi_align_window_pallas_batched(
                level_feats, strides, rois, k - 2,
                out_size or roi.output_size, roi.sampling_ratio,
                window=roi.window,
            )
        return jax.vmap(
            functools.partial(
                self._pool_single, training=training, out_size=out_size
            )
        )(feats, rois)

    def _pool_single(self, feats: Dict[str, jnp.ndarray], rois: jnp.ndarray,
                     training: bool = False, out_size: int | None = None):
        """Chunked wrapper over :meth:`_pool_single_impl` — bounds the
        bilinear-gather workspace (the jnp RoI-Align fallback would otherwise
        materialize [R, S*r, S*r, C] corner tensors for all R at once).

        The gather backend always needs this: its per-RoI corner tensors are
        4x the pooled output. The MXU-einsum backends pool all RoIs in one
        shot when they fit (the ``lax.map`` chunk loop serializes — measured
        27 ms/batch at b=32x300 RoIs on v5e when applied needlessly) but are
        chunked once their [R, s, dim, C] contraction intermediate would
        exceed ``roi.mxu_chunk_budget_mb`` per image — 1000 FPN proposals on
        an 832² P2 map would otherwise materialize ~24 GB batched."""
        roi_cfg = self.cfg.roi
        pooled_size = out_size or roi_cfg.output_size
        chunk = roi_cfg.pooler_chunk
        r = rois.shape[0]
        needs_bounding = roi_cfg.pooler == "roi_align_gather"
        if (not needs_bounding and roi_cfg.mxu_chunk_budget_mb > 0
                and roi_cfg.pooler in ("roi_align", "roi_align_packed",
                                       "roi_align_window")):
            some = next(iter(feats.values()))
            ch = some.shape[-1]
            itemsize = jnp.dtype(some.dtype).itemsize
            if roi_cfg.pooler == "roi_align_window" and training:
                # Training pools through roi_align_window_train (Pallas
                # forward, masked-sum-TRANSPOSE backward) on TPU, or the
                # masked sum itself elsewhere — either way the backward
                # materializes the per-level [R, s, dim, C] transpose
                # intermediates, so budget it as the masked-sum path.
                dim = max(min(f.shape[0], f.shape[1]) for f in feats.values())
            elif roi_cfg.pooler == "roi_align_window":
                if self.cfg.use_pallas and kernels.on_tpu_lowering():
                    # The Pallas kernel double-buffers a handful of tiles
                    # in VMEM scratch — the [R, window, window, C] stack
                    # never exists in HBM, so chunking would only
                    # serialize it.
                    return self._pool_single_impl(
                        feats, rois, out_size=out_size
                    )
                # XLA fallback materializes the [R, window, window, C]
                # tile stack.
                per_roi = roi_cfg.window * roi_cfg.window * ch * itemsize
                dim = None
            elif roi_cfg.pooler == "roi_align_packed":
                # Packed pyramid: all levels concatenated into one
                # [sum(H_l), max(W_l), C] tensor; the einsum contracts over
                # min(max W_l, sum H_l) — usually > any single level's
                # min(H_l, W_l) on non-square canvases.
                dim = min(
                    max(f.shape[1] for f in feats.values()),
                    sum(f.shape[0] for f in feats.values()),
                )
            else:
                # Per-level masked-sum: the largest level dominates.
                dim = max(min(f.shape[0], f.shape[1]) for f in feats.values())
            if dim is not None:
                per_roi = pooled_size * dim * ch * itemsize
            budget = roi_cfg.mxu_chunk_budget_mb * (1 << 20)
            if r * per_roi > budget:
                needs_bounding = True
                chunk = max(32, budget // per_roi)
        if not needs_bounding or chunk <= 0 or r <= chunk:
            return self._pool_single_impl(feats, rois, training, out_size)
        pad = (-r) % chunk
        padded = jnp.concatenate([rois, jnp.zeros((pad, 4), rois.dtype)], 0)
        out = jax.lax.map(
            lambda rc: self._pool_single_impl(feats, rc, training, out_size),
            padded.reshape(-1, chunk, 4),
        )
        return out.reshape((-1,) + out.shape[2:])[:r]

    def _pool_single_impl(self, feats: Dict[str, jnp.ndarray],
                          rois: jnp.ndarray, training: bool = False,
                          out_size: int | None = None):
        """Per-image C12: extract fixed-size RoI features.

        Single-scale: one roi_align on c4. FPN: FPN-paper level assignment
        k = floor(4 + log2(sqrt(area)/224)) clipped to [2,5]; every level is
        pooled and the assigned one selected per RoI (static-shape masked sum
        — levels p2..p5 only, p6 is proposal-only per the paper).
        """
        roi = self.cfg.roi
        s_out = out_size or roi.output_size
        if not self.cfg.backbone.use_fpn:
            stride = float(self.cfg.anchors.stride)
            fboxes = rois / stride
            return self._pool_one_level(feats["c4"], fboxes, s_out)

        fit = roi.window if roi.pooler == "roi_align_window" else 0
        k = fpn_assign_levels(rois, fit_window=fit)  # [R] in 2..5
        if roi.pooler == "roi_align_window" and not training:
            # Pool ONCE per RoI against a static window at its assigned
            # level (VERDICT r1 item 4) instead of pooling at all four
            # levels and masked-summing — ~20x fewer pooling FLOPs. On TPU
            # the tile extraction runs as a Pallas DMA kernel with the
            # contraction fused in-VMEM (XLA's per-RoI dynamic_slice lowers
            # to a segment-count-bound gather that is SLOWER than the
            # masked sum it replaces); elsewhere the XLA gather formulation
            # computes identical values (kernels/roi_align_window.py).
            level_feats = [feats[f"p{l}"] for l in (2, 3, 4, 5)]
            lv_strides = (4.0, 8.0, 16.0, 32.0)
            if self.cfg.use_pallas and kernels.on_tpu_lowering():
                from tpudet.kernels.roi_align_window import (
                    roi_align_window_pallas,
                )

                return roi_align_window_pallas(
                    level_feats, lv_strides, rois, k - 2,
                    s_out, roi.sampling_ratio, window=roi.window,
                )
            return roi_align_window(
                level_feats, lv_strides, rois, k - 2,
                s_out, roi.sampling_ratio, window=roi.window,
            )
        if (roi.pooler == "roi_align_window" and training
                and self.cfg.use_pallas
                and kernels.on_tpu_lowering()):
            # Training on TPU: Pallas windowed FORWARD + masked-sum-
            # transpose BACKWARD (custom VJP in ops.roi_align) — same
            # values as the masked sum below to float tolerance, ~5x
            # cheaper forward, and no feature residuals saved.
            return roi_align_window_train(
                [feats[f"p{l}"] for l in (2, 3, 4, 5)],
                (4.0, 8.0, 16.0, 32.0),
                rois, s_out, roi.sampling_ratio,
                window=roi.window,
            )
        # pooler == "roi_align_window" in TRAINING otherwise falls through
        # to the masked sum below with the SAME fit-bumped level
        # assignment: the Pallas kernel itself has no VJP, and the masked
        # sum computes the same values (tested to float tolerance) with an
        # efficient einsum-transpose backward. Train/eval therefore pool
        # identically up to float tolerance.
        if roi.pooler == "roi_align_packed":
            # Packed-pyramid einsum pair (exact; see KERNELS.md): measured
            # 0.94x the per-level masked-sum below on v5e — padding W to
            # max(W_l) inflates the contraction FLOPs more than the saved
            # intermediate HBM traffic. Kept selectable as the measured
            # negative result; the default stays the per-level path.
            from tpudet.ops.roi_align import multi_level_roi_align_mxu

            return multi_level_roi_align_mxu(
                [feats[f"p{l}"] for l in (2, 3, 4, 5)],
                (4.0, 8.0, 16.0, 32.0),
                rois, k - 2, s_out, roi.sampling_ratio,
            )
        pooled = 0.0
        for level, stride in zip((2, 3, 4, 5), (4.0, 8.0, 16.0, 32.0)):
            feat = feats[f"p{level}"]
            fboxes = rois / stride
            p = self._pool_one_level(feat, fboxes, s_out)
            pooled = pooled + p * (k == level)[:, None, None, None]
        return pooled

    # ------------------------------------------------------------ training
    def _rpn_targets_single(self, anchors, gt_boxes, gt_valid, image_hw, rng):
        """Per-image C11: match, filter cross-boundary, sample 256."""
        cfg = self.cfg.rpn
        iou = box_ops.pairwise_iou(anchors, gt_boxes)
        matched, labels = match_boxes(
            iou, cfg.fg_iou_thresh, cfg.bg_iou_thresh,
            gt_valid=gt_valid, allow_low_quality=True,
        )
        if cfg.ignore_cross_boundary:
            # Backend-agnostic helper (same predicate on jnp arrays).
            inside = anchor_ops.anchor_validity_mask_np(
                anchors, image_hw[0], image_hw[1]
            )
            labels = jnp.where(inside, labels, -1)
        idx, is_pos, valid = sample_balanced(
            labels, rng, cfg.batch_size_per_image, cfg.positive_fraction
        )
        target_deltas = box_ops.encode_boxes(
            gt_boxes[matched[idx]], anchors[idx], cfg.box_reg_weights
        )
        return idx, is_pos, valid, target_deltas

    def _roi_targets_single(
        self, proposals, prop_valid, gt_boxes, gt_classes, gt_valid, rng,
        reg_weights=None,
    ):
        """Per-image C14: append GT, match at 0.5, sample 25% fg.

        ``reg_weights`` overrides the delta normalization (the cascade's
        stage-1 schedule); default: the roi group's."""
        cfg = self.cfg.roi
        if cfg.append_gt:
            proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
            prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
        iou = box_ops.pairwise_iou(proposals, gt_boxes)
        matched, labels = match_boxes(
            iou, cfg.fg_iou_thresh, cfg.bg_iou_thresh_hi,
            gt_valid=gt_valid, allow_low_quality=False,
            bg_thresh_lo=cfg.bg_iou_thresh_lo,
        )
        labels = jnp.where(prop_valid, labels, -1)
        idx, is_fg, valid = sample_balanced(
            labels, rng, cfg.batch_size_per_image, cfg.positive_fraction
        )
        boxes = proposals[idx]
        mgt = matched[idx]
        target_deltas = box_ops.encode_boxes(
            gt_boxes[mgt], boxes,
            cfg.box_reg_weights if reg_weights is None else reg_weights,
        )
        target_classes = jnp.where(
            is_fg & valid, gt_classes[mgt], 0
        ).astype(jnp.int32)
        # mgt (each sampled RoI's matched-GT index) rides along for branch
        # extensions (the mask head resamples the matched GT's mask crop);
        # it is only meaningful where is_fg & valid.
        return boxes, target_classes, target_deltas, is_fg, valid, mgt

    def _rpn_stage_losses(self, anchors, rpn_logits, rpn_deltas, batch, rng):
        """RPN targets + losses over the batch (shared with the cascade
        family): -> (mean cls loss, mean box loss, mean positive count)."""
        b = rpn_logits.shape[0]
        rpn_keys = jax.random.split(rng, b)
        idx, is_pos, valid, tgt_deltas = jax.vmap(
            functools.partial(self._rpn_targets_single, anchors)
        )(batch["gt_boxes"], batch["gt_valid"], batch["image_hw"], rpn_keys)

        sampled_logits = jnp.take_along_axis(rpn_logits, idx, axis=1)
        sampled_deltas = jnp.take_along_axis(
            rpn_deltas, idx[..., None], axis=1
        )
        rpn_cls, rpn_box = jax.vmap(
            functools.partial(
                L.rpn_losses, box_weight=self.cfg.rpn.loss_weight_box
            )
        )(sampled_logits, sampled_deltas, tgt_deltas, is_pos, valid)
        num_pos = jnp.mean(
            jnp.sum(is_pos & valid, axis=1).astype(jnp.float32)
        )
        return jnp.mean(rpn_cls), jnp.mean(rpn_box), num_pos

    def loss(
        self, variables, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Full training forward: both losses in one jittable program (3a)."""
        cfg = self.cfg
        images = batch["image"]
        b = images.shape[0]
        anchors = self.anchor_boxes(images.shape[1:3])

        feats = self.core.apply(variables, images, method=DetectorCore.features)
        rpn_logits, rpn_deltas = self.core.apply(
            variables, feats, method=DetectorCore.rpn
        )

        # --- RPN targets + losses (per image, vmapped) ---
        rng_rpn, rng_roi = jax.random.split(rng)
        if cfg.det_only:
            # Fast R-CNN stage of the alternating schedule (paper §3.2 steps
            # 2/4): the RPN only SUPPLIES proposals (its params are frozen —
            # enforced at make_train_step); no RPN targets or losses, so the
            # whole assignment/sampling cone is never built.
            rpn_cls = rpn_box = num_pos = None
        else:
            rpn_cls, rpn_box, num_pos = self._rpn_stage_losses(
                anchors, rpn_logits, rpn_deltas, batch, rng_rpn
            )

        if cfg.rpn_only:
            # Standalone RPN training (reference 3e): detection branch off.
            total = rpn_cls + rpn_box
            return total, {
                "loss": total,
                "rpn_cls_loss": rpn_cls,
                "rpn_box_loss": rpn_box,
                "num_pos_anchors": num_pos,
            }

        # --- Proposals -> RoI targets -> head losses ---
        prop_boxes, _, prop_valid = self.proposals(
            rpn_logits, rpn_deltas, batch["image_hw"], training=True,
            canvas_hw=images.shape[1:3],
        )
        roi_keys = jax.random.split(rng_roi, b)
        roi_boxes, tgt_cls, tgt_box, is_fg, roi_valid, mgt = jax.vmap(
            self._roi_targets_single
        )(
            prop_boxes, prop_valid, batch["gt_boxes"], batch["gt_classes"],
            batch["gt_valid"], roi_keys,
        )

        pooled = self._pool_batch(feats, roi_boxes, training=True)
        r = roi_boxes.shape[1]
        pooled_flat = pooled.reshape((b * r,) + pooled.shape[2:])
        cls_logits, det_deltas = self.core.apply(
            variables, pooled_flat, method=DetectorCore.roi_head
        )
        cls_logits = cls_logits.reshape(b, r, -1)
        det_deltas = det_deltas.reshape(b, r, -1, 4)

        det_cls, det_box = jax.vmap(L.detection_losses)(
            cls_logits, det_deltas, tgt_cls, tgt_box, is_fg, roi_valid
        )
        det_cls, det_box = jnp.mean(det_cls), jnp.mean(det_box)

        if cfg.det_only:
            total = det_cls + det_box
            return total, {
                "loss": total,
                "det_cls_loss": det_cls,
                "det_box_loss": det_box,
                "num_fg_rois": jnp.mean(
                    jnp.sum(is_fg & roi_valid, axis=1).astype(jnp.float32)
                ),
            }

        total = rpn_cls + rpn_box + det_cls + det_box
        metrics = {
            "rpn_cls_loss": rpn_cls,
            "rpn_box_loss": rpn_box,
            "det_cls_loss": det_cls,
            "det_box_loss": det_box,
            "num_pos_anchors": num_pos,
            "num_fg_rois": jnp.mean(jnp.sum(is_fg & roi_valid, axis=1).astype(jnp.float32)),
        }
        # Family extension point (Mask R-CNN adds its mask BCE here); base
        # detector contributes nothing.
        for name, value in self._extra_losses(
            variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt, batch
        ).items():
            total = total + value
            metrics[name] = value
        metrics["loss"] = total
        return total, metrics

    # --------------------------------------------------- family extensions
    def _extra_losses(
        self, variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt,
        batch,
    ) -> Dict[str, jnp.ndarray]:
        """Additional loss terms from subclassing families (name -> scalar).

        Inputs are the shared second-stage state: FPN/C4 features, the
        sampled RoIs [B, K, 4] with their target classes / fg / validity
        masks, and each RoI's matched-GT index ``mgt`` [B, K]."""
        del variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt, batch
        return {}

    def _predict_extras(self, variables, feats, out, batch):
        """Augment the detection dict with family-specific outputs (Mask
        R-CNN adds per-detection masks). Base: identity."""
        del variables, feats, batch
        return out

    # ----------------------------------------------------------- inference
    def _postprocess_single(
        self, proposals, prop_valid, cls_logits, det_deltas, image_hw
    ):
        """Per-image C16: per-class decode -> score thresh -> per-class NMS
        -> top max_detections. Static [D] outputs + validity mask."""
        cfg = self.cfg.roi
        num_classes = self.cfg.data.num_classes
        p = proposals.shape[0]

        probs = jax.nn.softmax(cls_logits, axis=-1)[:, 1:]  # [P, C]
        if det_deltas.shape[1] == 1:
            det_deltas = jnp.broadcast_to(det_deltas, (p, num_classes, 4))
        boxes = box_ops.decode_boxes(
            det_deltas,
            jnp.broadcast_to(proposals[:, None, :], (p, num_classes, 4)),
            cfg.box_reg_weights,
        )  # [P, C, 4]
        boxes = box_ops.clip_boxes(boxes, image_hw)
        return self._final_nms(boxes, probs, prop_valid)

    def _final_nms(self, boxes, probs, prop_valid):
        """Shared tail of C16 (also the cascade's): flatten the [P, C]
        (box, class) candidates -> score thresh -> candidate cap -> one
        class-aware NMS -> top max_detections. Static [D] outputs + mask."""
        cfg = self.cfg.roi
        p, num_classes = probs.shape

        flat_boxes = boxes.reshape(-1, 4)
        flat_scores = probs.reshape(-1)
        flat_classes = jnp.tile(
            jnp.arange(1, num_classes + 1, dtype=jnp.int32), (p,)
        )
        flat_valid = jnp.repeat(prop_valid, num_classes) & (
            flat_scores > cfg.score_thresh
        )

        # Keep the NMS loop short: pre-select top candidates by score. In
        # dense scenes a candidate below the cap could survive exact per-class
        # NMS; roi.max_nms_candidates = -1 gives protocol-exact
        # postprocessing (all P*C candidates — the eval CLI's default) at
        # some NMS cost.
        if cfg.max_nms_candidates < 0:
            cap = flat_scores.shape[0]
        else:
            cap = cfg.max_nms_candidates or MAX_NMS_CANDIDATES
        k_cand = min(flat_scores.shape[0], cap)
        cand_scores, cand_idx = jax.lax.top_k(
            jnp.where(flat_valid, flat_scores, -1.0), k_cand
        )
        cand_boxes = flat_boxes[cand_idx]
        cand_classes = flat_classes[cand_idx]
        cand_valid = cand_scores > 0

        keep, out_scores, valid = class_aware_select(
            cand_boxes, cand_scores, cand_classes,
            cfg.nms_thresh, cfg.max_detections, valid_mask=cand_valid,
            method=cfg.nms_method, sigma=cfg.soft_nms_sigma,
            prune_threshold=cfg.score_thresh,
            use_pallas=self.cfg.use_pallas,
            coordinate_offset=_nms_offset(self.cfg),
        )
        return (
            cand_boxes[keep],
            out_scores,
            jnp.where(valid, cand_classes[keep], 0),
            valid,
        )

    def predict(self, variables, batch: Dict[str, jnp.ndarray]):
        """Full inference forward (3b): one jittable program.

        Returns dict: boxes [B, D, 4], scores [B, D], classes [B, D] (1..C),
        valid [B, D], num_detections [B].
        """
        images = batch["image"]
        feats = self.core.apply(variables, images, method=DetectorCore.features)
        rpn_logits, rpn_deltas = self.core.apply(
            variables, feats, method=DetectorCore.rpn
        )
        prop_boxes, prop_scores, prop_valid = self.proposals(
            rpn_logits, rpn_deltas, batch["image_hw"], training=False,
            canvas_hw=images.shape[1:3],
        )
        if self.cfg.rpn_only:
            # RPN as a class-agnostic detector (reference 3e).
            d = min(self.cfg.roi.max_detections, prop_boxes.shape[1])
            return {
                "boxes": prop_boxes[:, :d],
                "scores": jnp.where(prop_valid[:, :d], prop_scores[:, :d], 0.0),
                "classes": jnp.where(prop_valid[:, :d], 1, 0),
                "valid": prop_valid[:, :d],
                "num_detections": jnp.sum(prop_valid[:, :d], axis=1).astype(jnp.int32),
            }
        b, r = prop_boxes.shape[:2]
        pooled = self._pool_batch(feats, prop_boxes)
        pooled_flat = pooled.reshape((b * r,) + pooled.shape[2:])
        cls_logits, det_deltas = self.core.apply(
            variables, pooled_flat, method=DetectorCore.roi_head
        )
        cls_logits = cls_logits.reshape(b, r, -1)
        det_deltas = det_deltas.reshape(b, r, det_deltas.shape[1], 4)

        boxes, scores, classes, valid = jax.vmap(self._postprocess_single)(
            prop_boxes, prop_valid, cls_logits, det_deltas, batch["image_hw"]
        )
        out = {
            "boxes": boxes,
            "scores": scores,
            "classes": classes,
            "valid": valid,
            "num_detections": jnp.sum(valid, axis=1).astype(jnp.int32),
        }
        return self._predict_extras(variables, feats, out, batch)
