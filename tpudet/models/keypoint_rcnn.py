"""Keypoint R-CNN (He et al., arXiv:1703.06870 §5) — the two-stage detector
plus a per-RoI keypoint-heatmap FCN, built from the framework's shared
components exactly like the mask family (a build extra beyond the box-only
TF2 reference).

The subclass hooks the same two extension points as Mask R-CNN:

  * ``_extra_losses`` — training. The balanced sampler's positives-first
    STATIC prefix feeds the keypoint branch (no dynamic gather); targets are
    grid INDICES computed on device by pure arithmetic from each RoI and its
    matched GT keypoints (``_keypoint_targets_single`` — no rasterization at
    all, unlike the mask branch's resample), then a softmax over the S²
    heatmap per visible keypoint (the paper's one-hot formulation).

  * ``_predict_extras`` — inference. Pools the FINAL detections, one FCN
    pass, per-keypoint argmax over the heatmap -> sub-cell canvas
    coordinates + softmax confidence: ``keypoints`` [B, D, K, 3] (x, y,
    score) in canvas coords (the same frame as ``boxes`` — callers rescale
    to original coords with the boxes' factors).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from tpudet.config import Config
from tpudet.models.faster_rcnn import DetectorCore, FasterRCNN
from tpudet.train import losses as L


class KeypointRCNN(FasterRCNN):
    """FasterRCNN + keypoint branch; same init/loss/predict surface."""

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        if cfg.rpn_only or cfg.det_only:
            raise ValueError(
                "keypoint_rcnn does not support the rpn_only/det_only "
                "alternating-training modes (train the faster_rcnn family "
                "in those modes and import the weights)"
            )
        for a, b in cfg.data.keypoint_flip_pairs:
            if not (0 <= a < cfg.data.num_keypoints
                    and 0 <= b < cfg.data.num_keypoints):
                raise ValueError(
                    f"keypoint_flip_pairs entry {(a, b)} out of range for "
                    f"num_keypoints={cfg.data.num_keypoints}"
                )

    @property
    def _heatmap_size(self) -> int:
        """Heatmap side S: pooled s -> deconv 2s -> bilinear 4s."""
        return 4 * self.cfg.keypoint.roi_output_size

    @property
    def _num_kp_rois(self) -> int:
        roi = self.cfg.roi
        return int(round(roi.batch_size_per_image * roi.positive_fraction))

    def _keypoint_targets_single(self, rois, gt_keypoints, matched_gt):
        """Per-image keypoint targets, pure arithmetic (no rasterization):
        each matched GT keypoint lands in its RoI-frame heatmap cell; a
        target is valid when the keypoint is labeled (v > 0) AND falls
        strictly inside the RoI (the paper/Detectron rule).

        rois [R, 4], gt_keypoints [G, K, 3], matched_gt [R] ->
        (flat grid index [R, K] int32, valid [R, K] bool)."""
        s = self._heatmap_size
        kp = gt_keypoints[matched_gt]                     # [R, K, 3]
        x1, y1 = rois[:, 0:1], rois[:, 1:2]
        w = jnp.maximum(rois[:, 2:3] - x1, 1e-6)
        h = jnp.maximum(rois[:, 3:4] - y1, 1e-6)
        u = (kp[..., 0] - x1) / w * s                     # [R, K]
        v = (kp[..., 1] - y1) / h * s
        inside = (u >= 0) & (u < s) & (v >= 0) & (v < s)
        valid = inside & (kp[..., 2] > 0)
        gx = jnp.clip(jnp.floor(u), 0, s - 1).astype(jnp.int32)
        gy = jnp.clip(jnp.floor(v), 0, s - 1).astype(jnp.int32)
        return gy * s + gx, valid

    def _extra_losses(
        self, variables, feats, roi_boxes, tgt_cls, is_fg, roi_valid, mgt,
        batch,
    ) -> Dict[str, jnp.ndarray]:
        if "gt_keypoints" not in batch:
            raise KeyError(
                "keypoint_rcnn training needs batch['gt_keypoints'] — set "
                "data.load_keypoints=True so the loader emits them"
            )
        k = self.cfg.keypoint
        kf = self._num_kp_rois
        b = roi_boxes.shape[0]
        rois = roi_boxes[:, :kf]
        fg_valid = (is_fg & roi_valid)[:, :kf]
        matched = mgt[:, :kf]

        tgt_idx, tgt_valid = jax.vmap(self._keypoint_targets_single)(
            rois, batch["gt_keypoints"], matched
        )
        # Indices/validity are data, not a differentiation path.
        tgt_idx = jax.lax.stop_gradient(tgt_idx)
        tgt_valid = jax.lax.stop_gradient(tgt_valid)

        pooled = self._pool_batch(
            feats, rois, training=True, out_size=k.roi_output_size
        )
        pooled_flat = pooled.reshape((b * kf,) + pooled.shape[2:])
        logits = self.core.apply(
            variables, pooled_flat, method=DetectorCore.keypoints
        )
        s = self._heatmap_size
        logits = logits.reshape(b, kf, s, s, -1)

        per_image = jax.vmap(L.keypoint_loss)(
            logits, tgt_idx, tgt_valid, fg_valid
        )
        # NOTE: every entry here is ADDED to the total loss (_extra_losses
        # contract) — no metric-only values.
        return {"keypoint_loss": k.loss_weight * jnp.mean(per_image)}

    def _predict_extras(self, variables, feats, out, batch):
        k = self.cfg.keypoint
        boxes = out["boxes"]
        b, d = boxes.shape[:2]
        pooled = self._pool_batch(feats, boxes, out_size=k.roi_output_size)
        pooled_flat = pooled.reshape((b * d,) + pooled.shape[2:])
        logits = self.core.apply(
            variables, pooled_flat, method=DetectorCore.keypoints
        )  # [B*D, S, S, K]
        s = self._heatmap_size
        nk = logits.shape[-1]
        flat = logits.reshape(b * d, s * s, nk)
        probs = jax.nn.softmax(flat, axis=1)
        idx = jnp.argmax(flat, axis=1)                    # [B*D, K]
        score = jnp.take_along_axis(probs, idx[:, None, :], axis=1)[:, 0, :]
        gx = (idx % s).astype(jnp.float32) + 0.5
        gy = (idx // s).astype(jnp.float32) + 0.5

        fb = boxes.reshape(b * d, 4)
        x1, y1 = fb[:, 0:1], fb[:, 1:2]
        w = jnp.maximum(fb[:, 2:3] - x1, 1e-6)
        h = jnp.maximum(fb[:, 3:4] - y1, 1e-6)
        kx = x1 + gx / s * w
        ky = y1 + gy / s * h
        kps = jnp.stack([kx, ky, score], axis=-1).reshape(b, d, nk, 3)
        out["keypoints"] = kps * out["valid"][:, :, None, None]
        return out
