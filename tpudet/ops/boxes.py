"""Box geometry: IoU, encode/decode, clip, flip (SURVEY.md C7, C8).

Convention: boxes are ``[x1, y1, x2, y2]`` in absolute input-image pixels,
``x2 > x1``, ``y2 > y1``. Width/height are ``x2 - x1`` / ``y2 - y1`` (no +1 —
the continuous convention, matching TF2's ops which the reference uses).

Box delta parameterization (Faster R-CNN, arXiv:1506.01497 §3.1.2):
    t_x = (x - x_a) / w_a        t_w = log(w / w_a)
    t_y = (y - y_a) / h_a        t_h = log(h / h_a)
optionally scaled by per-coordinate weights (Fast R-CNN uses (10,10,5,5) for
the second stage). ``decode`` is the exact inverse with dw/dh clamped at
log(1000/16) to avoid exp overflow on garbage predictions.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

# Clamp on dw/dh before exp, standard Fast R-CNN practice.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [...]: box areas (0 for degenerate boxes)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between [N, 4] and [M, 4] boxes -> [N, M] (SURVEY.md C8).

    Broadcast form; O(N*M) memory. Degenerate boxes get IoU 0.
    """
    a1 = area(boxes1)  # [N]
    a2 = area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N, M, 2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N, M, 2]
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # [N, M]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode_boxes(
    boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode target ``boxes`` relative to ``anchors`` -> deltas [..., 4]."""
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha

    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    x = boxes[..., 0] + 0.5 * w
    y = boxes[..., 1] + 0.5 * h

    # Guard against degenerate anchors/boxes (padding rows): avoid div0/log0.
    wa = jnp.maximum(wa, 1e-6)
    ha = jnp.maximum(ha, 1e-6)
    w = jnp.maximum(w, 1e-6)
    h = jnp.maximum(h, 1e-6)

    wx, wy, ww, wh = weights
    tx = wx * (x - xa) / wa
    ty = wy * (y - ya) / ha
    tw = ww * jnp.log(w / wa)
    th = wh * jnp.log(h / ha)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Apply deltas [..., 4] to anchors [..., 4] -> boxes [..., 4]."""
    wa = anchors[..., 2] - anchors[..., 0]
    ha = anchors[..., 3] - anchors[..., 1]
    xa = anchors[..., 0] + 0.5 * wa
    ya = anchors[..., 1] + 0.5 * ha

    wx, wy, ww, wh = weights
    tx = deltas[..., 0] / wx
    ty = deltas[..., 1] / wy
    tw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    th = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    x = tx * wa + xa
    y = ty * ha + ya
    w = jnp.exp(tw) * wa
    h = jnp.exp(th) * ha

    return jnp.stack(
        [x - 0.5 * w, y - 0.5 * h, x + 0.5 * w, y + 0.5 * h], axis=-1
    )


def elementwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[N] generalized IoU of row-aligned box pairs (Rezatofighi et al.,
    arXiv:1902.09630): IoU − |hull \\ union| / |hull|, in [−1, 1]. Used as
    1 − GIoU box loss by the anchor-free family — it compares DECODED boxes,
    so no delta-space normalization convention is needed."""
    x1 = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    y1 = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    x2 = jnp.minimum(boxes1[..., 2], boxes2[..., 2])
    y2 = jnp.minimum(boxes1[..., 3], boxes2[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    union = area(boxes1) + area(boxes2) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    hx1 = jnp.minimum(boxes1[..., 0], boxes2[..., 0])
    hy1 = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    hx2 = jnp.maximum(boxes1[..., 2], boxes2[..., 2])
    hy2 = jnp.maximum(boxes1[..., 3], boxes2[..., 3])
    hull = jnp.maximum(hx2 - hx1, 0) * jnp.maximum(hy2 - hy1, 0)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def pairwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[N, M] generalized IoU between every pair (same formula as
    ``elementwise_giou``; used as the GIoU term of the DETR matching cost,
    where every GT must be scored against every query)."""
    b1 = boxes1[:, None, :]  # [N, 1, 4]
    b2 = boxes2[None, :, :]  # [1, M, 4]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    union = area(boxes1)[:, None] + area(boxes2)[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    hx1 = jnp.minimum(b1[..., 0], b2[..., 0])
    hy1 = jnp.minimum(b1[..., 1], b2[..., 1])
    hx2 = jnp.maximum(b1[..., 2], b2[..., 2])
    hy2 = jnp.maximum(b1[..., 3], b2[..., 3])
    hull = jnp.maximum(hx2 - hx1, 0) * jnp.maximum(hy2 - hy1, 0)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corner boxes -> (center_x, center_y, width, height) — the DETR
    regression parameterization."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.stack(
        [boxes[..., 0] + 0.5 * w, boxes[..., 1] + 0.5 * h, w, h], axis=-1
    )


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(center_x, center_y, width, height) -> corner boxes."""
    cx, cy, w, h = (
        boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    )
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, image_hw: Tuple[int, int] | jnp.ndarray) -> jnp.ndarray:
    """Clip boxes to [0, W] x [0, H]. ``image_hw`` = (height, width)."""
    h, w = image_hw[0], image_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def flip_boxes_horizontal(boxes: jnp.ndarray, image_width) -> jnp.ndarray:
    """Mirror boxes for a horizontally flipped image of given width."""
    x1 = image_width - boxes[..., 2]
    x2 = image_width - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
