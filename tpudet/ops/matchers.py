"""IoU-based target assignment (SURVEY.md C11/C14).

One matcher serves both stages:
  * RPN (Faster R-CNN §3.1.2): positive if IoU > 0.7 **or** the anchor has the
    highest IoU with some GT box (``allow_low_quality=True``, including ties);
    negative if IoU < 0.3; otherwise ignored.
  * Detection head (Fast R-CNN §2.3): fg if IoU >= 0.5, bg if IoU in
    [bg_lo, fg), ignored below bg_lo (``allow_low_quality=False``).

Everything is fixed-shape: GT boxes arrive padded to ``max_gt_boxes`` with a
validity mask; invalid GT columns are excluded by forcing their IoU to -1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def match_boxes(
    iou: jnp.ndarray,
    fg_thresh: float,
    bg_thresh: float,
    gt_valid: Optional[jnp.ndarray] = None,
    allow_low_quality: bool = False,
    bg_thresh_lo: float = -1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match rows (anchors/proposals) of an IoU matrix to columns (GT).

    Args:
      iou: [N, G] pairwise IoU.
      fg_thresh: IoU >= fg_thresh -> positive (label 1).
      bg_thresh: IoU < bg_thresh (and >= bg_thresh_lo) -> negative (label 0).
      gt_valid: [G] bool mask of real GT boxes (padding excluded).
      allow_low_quality: also mark as positive every row achieving the per-GT
        maximum IoU (Faster R-CNN's argmax rule, ties included).
      bg_thresh_lo: rows with max IoU below this are ignored rather than
        negative (Fast R-CNN background range [0.1, 0.5); default -1 disables).

    Returns:
      matched_idx: [N] int32 — argmax GT column per row (0 if no valid GT).
      labels: [N] int32 — 1 positive, 0 negative, -1 ignored.
    """
    if gt_valid is not None:
        iou = jnp.where(gt_valid[None, :], iou, -1.0)

    matched_idx = jnp.argmax(iou, axis=1).astype(jnp.int32)
    max_iou = jnp.max(iou, axis=1)

    labels = jnp.full(iou.shape[:1], -1, dtype=jnp.int32)
    is_neg = (max_iou < bg_thresh) & (max_iou >= bg_thresh_lo)
    labels = jnp.where(is_neg, 0, labels)
    labels = jnp.where(max_iou >= fg_thresh, 1, labels)

    if allow_low_quality:
        per_gt_max = jnp.max(iou, axis=0)  # [G]
        is_best = (iou == per_gt_max[None, :]) & (per_gt_max[None, :] > 0)
        if gt_valid is not None:
            is_best = is_best & gt_valid[None, :]
        labels = jnp.where(jnp.any(is_best, axis=1), 1, labels)

    # No valid GT at all -> everything negative (max_iou == -1 < bg_thresh
    # already handles this unless bg_thresh_lo excludes it; force it).
    if gt_valid is not None:
        no_gt = ~jnp.any(gt_valid)
        labels = jnp.where(no_gt, 0, labels)

    return matched_idx, labels
