"""Device-side mask-target resampling for the Mask R-CNN branch.

GT instance masks arrive from the loader as box-frame crops (``gt_masks``
[G, M, M] — see ``tpudet.data.masks`` for the storage rationale and the
shared coordinate convention). Training needs, for every sampled foreground
RoI, the matched GT's mask resampled over the RoI's extent at the head's
output resolution (Mask R-CNN, arXiv:1703.06870 §3: "the mask target is the
intersection between an RoI and its associated ground-truth mask").

TPU-first formulation: the sample grid is separable, so the whole resample
is two tiny dense matmuls per RoI — ``W_y [s, M] @ mask [M, M] @ W_x^T
[M, s]`` — with the hat-function weight rows encoding BOTH the bilinear
interpolation and the zero-outside-the-GT-box padding (a coordinate outside
[-1, M] gets an all-zero row; one in [-1, 0] bleeds linearly to zero exactly
as zero-padded bilinear sampling does). No gathers, no dynamic shapes, and
XLA batches the [s, M] x [M, M] x [M, s] einsums over all RoIs onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _hat_weights(coords: jnp.ndarray, m: int) -> jnp.ndarray:
    """[s] float coords -> [s, m] bilinear weight rows with zero padding.

    Row i holds max(0, 1 - |coords[i] - k|) over k = 0..m-1: at most two
    non-zeros summing to <= 1, exactly the zero-padded bilinear kernel."""
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(coords[:, None] - jnp.arange(m, dtype=coords.dtype))
    )


def crop_mask_to_roi(
    gt_mask: jnp.ndarray,  # [M, M] float in [0, 1] — box-frame GT crop
    gt_box: jnp.ndarray,   # [4] (x1, y1, x2, y2) the crop's frame
    roi: jnp.ndarray,      # [4] the proposal to resample over
    out_size: int,
) -> jnp.ndarray:
    """Resample one GT crop over one RoI's extent -> [out_size, out_size].

    Output pixel (i, j)'s center sits at the RoI-frame point
    ``y1r + (i + 0.5) * h_r / s`` (the extent-covering convention shared
    with ``data.masks``); values outside the GT box are zero."""
    m = gt_mask.shape[0]
    s = out_size
    x1g, y1g, x2g, y2g = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    wg = jnp.maximum(x2g - x1g, 1e-4)
    hg = jnp.maximum(y2g - y1g, 1e-4)
    idx = jnp.arange(s, dtype=jnp.float32) + 0.5
    ys = roi[1] + idx * (roi[3] - roi[1]) / s
    xs = roi[0] + idx * (roi[2] - roi[0]) / s
    # Image coords -> crop pixel coords (crop pixel k center at
    # y1g + (k + 0.5) * hg / M).
    v = (ys - y1g) * m / hg - 0.5
    u = (xs - x1g) * m / wg - 0.5
    wy = _hat_weights(v, m)  # [s, M]
    wx = _hat_weights(u, m)  # [s, M]
    return wy @ gt_mask.astype(jnp.float32) @ wx.T


def mask_targets(
    gt_masks: jnp.ndarray,    # [G, M, M] uint8/float box-frame crops
    gt_boxes: jnp.ndarray,    # [G, 4]
    rois: jnp.ndarray,        # [R, 4] sampled proposals
    matched_gt: jnp.ndarray,  # [R] int32 — index into gt_* per RoI
    out_size: int,
) -> jnp.ndarray:
    """Per-RoI binary mask targets [R, s, s] (resampled + binarized at 0.5).

    Rows whose RoI is background/invalid still produce (meaningless) targets
    — the loss masks them out; keeping the computation unconditional keeps
    the program static-shape."""
    import jax

    crops = gt_masks[matched_gt].astype(jnp.float32)  # [R, M, M]
    boxes = gt_boxes[matched_gt]
    resampled = jax.vmap(
        lambda c, b, r: crop_mask_to_roi(c, b, r, out_size)
    )(crops, boxes, rois)
    return (resampled >= 0.5).astype(jnp.float32)
