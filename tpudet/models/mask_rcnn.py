"""Mask R-CNN (He et al., arXiv:1703.06870) — the two-stage detector plus a
per-RoI mask FCN, built entirely from the framework's shared components (a
build extra beyond the box-only TF2 reference; SURVEY.md §2's head inventory
is RPN + Fast R-CNN only).

Everything except the mask branch IS FasterRCNN: same proposal machinery,
same RoI sampling, same box head and post-processing. The subclass hooks in
exactly two places:

  * ``_extra_losses`` — training. The balanced RoI sampler emits its
    positives FIRST (ops/samplers.py: priority 2+U for chosen positives vs
    1+U for negatives under one descending top-k), so the first
    ``K * positive_fraction`` sampled RoIs contain every foreground sample —
    a STATIC prefix. The mask branch pools only that prefix at the mask
    resolution (14² vs the box head's 7²), runs the FCN, and BCEs against
    targets resampled on-device from the loader's box-frame GT crops
    (ops/masks.py — two tiny matmuls per RoI, no gathers, no dynamic
    shapes). This is the TPU-native counterpart of the paper's "mask branch
    on positive RoIs only" without any dynamic-count gather.

  * ``_predict_extras`` — inference. Pools the FINAL detection boxes (after
    NMS, paper §3 "we predict masks from the refined boxes"), one FCN pass,
    then gathers each detection's predicted-class channel and sigmoids:
    ``masks`` [B, D, 2s, 2s] float probabilities in each box's own frame.
    Pasting to image resolution stays host-side (data/masks.py::paste_mask)
    — a [B, D, H, W] device paste would be pure HBM waste.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from tpudet.config import Config
from tpudet.models.faster_rcnn import FasterRCNN
from tpudet.ops.masks import mask_targets
from tpudet.train import losses as L


class MaskRCNN(FasterRCNN):
    """FasterRCNN + mask branch; same init/loss/predict surface."""

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        if cfg.rpn_only or cfg.det_only:
            raise ValueError(
                "mask_rcnn does not support the rpn_only/det_only "
                "alternating-training modes (train the faster_rcnn family "
                "in those modes and import the weights)"
            )

    @property
    def _num_mask_rois(self) -> int:
        """Static per-image mask-branch RoI count: the sampler's
        positives-first prefix length."""
        roi = self.cfg.roi
        return int(round(roi.batch_size_per_image * roi.positive_fraction))

    def _extra_losses(
        self, variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt,
        batch,
    ) -> Dict[str, jnp.ndarray]:
        if "gt_masks" not in batch:
            raise KeyError(
                "mask_rcnn training needs batch['gt_masks'] — set "
                "data.load_masks=True so the loader emits box-frame GT "
                "mask crops"
            )
        m = self.cfg.mask
        kf = self._num_mask_rois
        b = roi_boxes.shape[0]
        rois = roi_boxes[:, :kf]
        fg_valid = (is_fg & roi_valid)[:, :kf]
        cls = tgt_cls[:, :kf]
        matched = mgt[:, :kf]

        s_out = 2 * m.roi_output_size  # deconv doubles the pooled size
        targets = jax.vmap(
            functools.partial(mask_targets, out_size=s_out)
        )(
            gt_masks=batch["gt_masks"],
            gt_boxes=batch["gt_boxes"],
            rois=rois,
            matched_gt=matched,
        )  # [B, kf, s_out, s_out]
        # Targets are data, not a differentiation path (GT crops are
        # constants but the RoI coords feed the resample weights).
        targets = jax.lax.stop_gradient(targets)

        pooled = self._pool_batch(
            feats, rois, training=True, out_size=m.roi_output_size
        )
        pooled_flat = pooled.reshape((b * kf,) + pooled.shape[2:])
        from tpudet.models.faster_rcnn import DetectorCore

        logits = self.core.apply(
            variables, pooled_flat, method=DetectorCore.masks
        ).reshape((b, kf) + (s_out, s_out, -1))

        per_image = jax.vmap(L.mask_loss)(logits, targets, cls, fg_valid)
        return {"mask_loss": m.loss_weight * jnp.mean(per_image)}

    def _predict_extras(self, variables, feats, out, batch):
        m = self.cfg.mask
        boxes, classes = out["boxes"], out["classes"]
        b, d = boxes.shape[:2]
        pooled = self._pool_batch(feats, boxes, out_size=m.roi_output_size)
        pooled_flat = pooled.reshape((b * d,) + pooled.shape[2:])
        from tpudet.models.faster_rcnn import DetectorCore

        logits = self.core.apply(
            variables, pooled_flat, method=DetectorCore.masks
        )  # [B*D, 2s, 2s, C]
        if logits.shape[-1] == 1:
            sel = logits[..., 0]
        else:
            slot = jnp.clip(
                classes.reshape(-1) - 1, 0, logits.shape[-1] - 1
            )
            sel = jnp.take_along_axis(
                logits, slot[:, None, None, None], axis=-1
            )[..., 0]
        probs = jax.nn.sigmoid(sel).reshape(b, d, *sel.shape[1:])
        out["masks"] = probs * out["valid"][:, :, None, None]
        return out
