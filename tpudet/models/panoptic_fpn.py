"""Panoptic FPN (Kirillov et al., arXiv:1901.02446) — Mask R-CNN plus a
lightweight semantic FCN over the shared FPN, fused host-side into a
panoptic segmentation (a build extra beyond the box-only TF2 reference).

The model itself IS MaskRCNN with one more branch wired through the same
two extension hooks: the semantic head consumes the already-computed FPN
dict (zero extra backbone cost), trains with per-pixel CE at 1/4 scale
against the loader's downsampled class map (label 0 = void/padding,
ignored), and predicts a [B, H/4, W/4] argmax class map alongside the
instance outputs. The panoptic MERGE (paste instances by score, fill stuff
from the semantic map) and the PQ metric are host-side — see
``tpudet/eval/panoptic.py`` — exactly where dynamic segment counts are
free.

Label space: 0 void, 1..S stuff (S = data.num_stuff_classes), S+1..S+C
things (C = data.num_classes — the detection classes shifted by S)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from tpudet.config import Config
from tpudet.models.faster_rcnn import DetectorCore
from tpudet.models.mask_rcnn import MaskRCNN
from tpudet.train import losses as L


class PanopticFPN(MaskRCNN):
    """MaskRCNN + semantic branch; same init/loss/predict surface."""

    def __init__(self, cfg: Config):
        if not cfg.backbone.use_fpn:
            raise ValueError(
                "model='panoptic_fpn' requires backbone.use_fpn=True "
                "(the semantic head consumes the p2..p5 pyramid)"
            )
        if not cfg.data.load_masks or not cfg.data.load_semantic:
            raise ValueError(
                "model='panoptic_fpn' needs data.load_masks=True (instance "
                "branch) AND data.load_semantic=True (semantic branch)"
            )
        super().__init__(cfg)

    def _extra_losses(
        self, variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt,
        batch,
    ) -> Dict[str, jnp.ndarray]:
        losses = super()._extra_losses(
            variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt,
            batch,
        )
        if "gt_semantic" not in batch:
            raise KeyError(
                "panoptic_fpn training needs batch['gt_semantic'] — set "
                "data.load_semantic=True so the loader emits the 1/4-scale "
                "class maps"
            )
        logits = self.core.apply(
            variables, feats, method=DetectorCore.semantic
        )
        losses["semantic_loss"] = (
            self.cfg.panoptic.loss_weight
            * L.semantic_loss(logits, batch["gt_semantic"])
        )
        return losses

    def _predict_extras(self, variables, feats, out, batch):
        out = super()._predict_extras(variables, feats, out, batch)
        logits = self.core.apply(
            variables, feats, method=DetectorCore.semantic
        )
        # Labels 1..S+C at 1/4 scale (0 is never predicted — it is the
        # void/ignore label); the host-side fusion masks padding itself.
        out["semantic"] = (
            jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
        )
        return out
