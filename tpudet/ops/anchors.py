"""Anchor grid generation (SURVEY.md C6; Faster R-CNN §3.1.1).

k = len(scales) * len(aspect_ratios) anchors per feature cell, centered at
``stride * (i + 0.5)``. For a scale s and aspect ratio a (h/w), the anchor is
``w = s / sqrt(a)``, ``h = s * sqrt(a)`` — area s² preserved across ratios.

Anchors are a pure function of static shapes, so they are computed with NumPy
at trace time and folded into the compiled XLA program as a constant — the
TPU never spends a cycle regenerating them per step (this is the TPU-native
answer to the reference's per-call anchor op; a Pallas generator would only
re-materialize a constant). Returned as a jnp array [H*W*A, 4] (x1,y1,x2,y2).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def base_anchors_np(
    scales: Sequence[float], aspect_ratios: Sequence[float]
) -> np.ndarray:
    """[A, 4] zero-centered base anchors; A = len(scales)*len(ratios).

    Ordering: scale-major is NOT used — ratio-major matches the per-cell
    channel layout ``(ratio, scale)`` flattened as scales within ratios?  We
    fix ordering as all (scale, ratio) pairs with **scale varying slowest**:
    [(s0,r0), (s0,r1), ..., (s1,r0), ...]. The RPN head's 4k/2k channel
    layout uses the same ordering; consistency is all that matters.
    """
    out = []
    for s in scales:
        for r in aspect_ratios:
            w = s / np.sqrt(r)
            h = s * np.sqrt(r)
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def generate_anchors_np(
    feat_height: int,
    feat_width: int,
    stride: int,
    scales: Sequence[float],
    aspect_ratios: Sequence[float],
) -> np.ndarray:
    """[H*W*A, 4] anchor grid in input-image pixels, row-major over (y, x, a)."""
    base = base_anchors_np(scales, aspect_ratios)  # [A, 4]
    cx = (np.arange(feat_width, dtype=np.float32) + 0.5) * stride
    cy = (np.arange(feat_height, dtype=np.float32) + 0.5) * stride
    cxv, cyv = np.meshgrid(cx, cy)  # [H, W]
    centers = np.stack([cxv, cyv, cxv, cyv], axis=-1)  # [H, W, 4]
    anchors = centers[:, :, None, :] + base[None, None, :, :]  # [H, W, A, 4]
    return anchors.reshape(-1, 4)


def generate_anchors(
    feat_height: int,
    feat_width: int,
    stride: int,
    scales: Sequence[float],
    aspect_ratios: Sequence[float],
) -> jnp.ndarray:
    """jnp constant version of :func:`generate_anchors_np` (trace-time)."""
    return jnp.asarray(
        generate_anchors_np(feat_height, feat_width, stride, scales, aspect_ratios)
    )


def generate_fpn_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    scales: Sequence[float],
    aspect_ratios: Sequence[float],
) -> Tuple[jnp.ndarray, List[int]]:
    """Multi-level anchors for FPN (SURVEY.md C24).

    One scale per level (RetinaNet/FPN convention), all aspect ratios at each
    level. Returns (anchors [sum_l H_l*W_l*A, 4], per-level counts).
    """
    assert len(feat_shapes) == len(strides) == len(scales)
    per_level = []
    counts = []
    for (fh, fw), stride, scale in zip(feat_shapes, strides, scales):
        a = generate_anchors_np(fh, fw, stride, [scale], aspect_ratios)
        per_level.append(a)
        counts.append(a.shape[0])
    return jnp.asarray(np.concatenate(per_level, axis=0)), counts


def generate_points_np(
    feat_height: int, feat_width: int, stride: int
) -> np.ndarray:
    """[H*W, 2] anchor-free location grid (FCOS, arXiv:1904.01355 §3.1):
    the center of every feature cell in input-image pixels, (x, y),
    row-major over (y, x) — the same trace-time-constant treatment as the
    anchor grids (a point is just an anchor with zero extent)."""
    cx = (np.arange(feat_width, dtype=np.float32) + 0.5) * stride
    cy = (np.arange(feat_height, dtype=np.float32) + 0.5) * stride
    cxv, cyv = np.meshgrid(cx, cy)  # [H, W]
    return np.stack([cxv, cyv], axis=-1).reshape(-1, 2)


def anchor_validity_mask_np(
    anchors: np.ndarray, image_height: float, image_width: float
) -> np.ndarray:
    """True for anchors fully inside the image (Faster R-CNN §3.1.3: ignore
    cross-boundary anchors during training)."""
    return (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] <= image_width)
        & (anchors[:, 3] <= image_height)
    )
