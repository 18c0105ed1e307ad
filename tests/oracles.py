"""Pure-NumPy oracles written directly from the paper equations
(SURVEY.md §4 item 1). Deliberately naive: loops over boxes, no vectorization
tricks — these define correctness for the jnp/Pallas implementations."""

from __future__ import annotations

import numpy as np


def np_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    out = np.zeros((len(boxes1), len(boxes2)), dtype=np.float64)
    for i, a in enumerate(boxes1):
        for j, b in enumerate(boxes2):
            ax1, ay1, ax2, ay2 = a
            bx1, by1, bx2, by2 = b
            iw = min(ax2, bx2) - max(ax1, bx1)
            ih = min(ay2, by2) - max(ay1, by1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            ua = max(ax2 - ax1, 0) * max(ay2 - ay1, 0)
            ub = max(bx2 - bx1, 0) * max(by2 - by1, 0)
            union = ua + ub - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def np_encode(boxes: np.ndarray, anchors: np.ndarray, weights=(1, 1, 1, 1)) -> np.ndarray:
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = anchors[:, 0] + 0.5 * wa
    ya = anchors[:, 1] + 0.5 * ha
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    x = boxes[:, 0] + 0.5 * w
    y = boxes[:, 1] + 0.5 * h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (x - xa) / wa,
            wy * (y - ya) / ha,
            ww * np.log(w / wa),
            wh * np.log(h / ha),
        ],
        axis=-1,
    )


def np_decode(deltas: np.ndarray, anchors: np.ndarray, weights=(1, 1, 1, 1)) -> np.ndarray:
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = anchors[:, 0] + 0.5 * wa
    ya = anchors[:, 1] + 0.5 * ha
    wx, wy, ww, wh = weights
    clip = np.log(1000.0 / 16.0)
    x = deltas[:, 0] / wx * wa + xa
    y = deltas[:, 1] / wy * ha + ya
    w = np.exp(np.minimum(deltas[:, 2] / ww, clip)) * wa
    h = np.exp(np.minimum(deltas[:, 3] / wh, clip)) * ha
    return np.stack(
        [x - 0.5 * w, y - 0.5 * h, x + 0.5 * w, y + 0.5 * h], axis=-1
    )


def np_nms(
    boxes: np.ndarray,
    scores: np.ndarray,
    iou_thresh: float,
    max_outputs: int,
    score_thresh: float | None = None,
) -> list[int]:
    """Greedy NMS. Ties in score broken toward the lower index (TF semantics)."""
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
    if score_thresh is not None:
        order = [i for i in order if scores[i] > score_thresh]
    keep: list[int] = []
    for i in order:
        ok = True
        for j in keep:
            if np_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > iou_thresh:
                ok = False
                break
        if ok:
            keep.append(i)
            if len(keep) >= max_outputs:
                break
    return keep


def np_match(
    iou: np.ndarray,
    fg: float,
    bg: float,
    allow_low_quality: bool,
    bg_lo: float = -1.0,
) -> tuple[np.ndarray, np.ndarray]:
    n, g = iou.shape
    matched = np.zeros(n, dtype=np.int64)
    labels = np.full(n, -1, dtype=np.int64)
    if g == 0:
        return matched, np.zeros(n, dtype=np.int64)
    for i in range(n):
        matched[i] = int(np.argmax(iou[i]))
        m = iou[i].max()
        if m >= fg:
            labels[i] = 1
        elif bg_lo <= m < bg:
            labels[i] = 0
    if allow_low_quality:
        for j in range(g):
            m = iou[:, j].max()
            if m > 0:
                for i in range(n):
                    if iou[i, j] == m:
                        labels[i] = 1
    return matched, labels


def np_roi_align(
    features: np.ndarray,
    boxes: np.ndarray,
    output_size: int,
    sampling_ratio: int,
    aligned: bool = True,
) -> np.ndarray:
    """Naive RoI Align (Mask R-CNN / Detectron2 semantics), [H,W,C] features."""
    h, w, c = features.shape
    n = len(boxes)
    s, r = output_size, sampling_ratio
    out = np.zeros((n, s, s, c), dtype=np.float64)
    off = 0.5 if aligned else 0.0
    for bi, (x1, y1, x2, y2) in enumerate(boxes):
        if aligned:
            bw = max(x2 - x1, 1e-6)
            bh = max(y2 - y1, 1e-6)
        else:
            bw = max(x2 - x1, 1.0)
            bh = max(y2 - y1, 1.0)
        x1 -= off
        y1 -= off
        bin_w, bin_h = bw / s, bh / s
        for i in range(s):
            for j in range(s):
                acc = np.zeros(c)
                for u in range(r):
                    for v in range(r):
                        y = y1 + (i + (u + 0.5) / r) * bin_h
                        x = x1 + (j + (v + 0.5) / r) * bin_w
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y_ = min(max(y, 0.0), h - 1)
                        x_ = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y0 = min(y0, h - 1)
                        x0 = min(x0, w - 1)
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += (
                            features[y0, x0] * (1 - ly) * (1 - lx)
                            + features[y0, x1i] * (1 - ly) * lx
                            + features[y1i, x0] * ly * (1 - lx)
                            + features[y1i, x1i] * ly * lx
                        )
                out[bi, i, j] = acc / (r * r)
    return out
