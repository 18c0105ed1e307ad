"""Test-time augmentation (eval CLI ``--tta hflip``): run inference on the
image AND its horizontal mirror, map the mirrored detections back, and merge
the two candidate sets with a per-class NMS — the standard detection TTA
recipe (e.g. Detectron's TEST.AUG), worth ~0.5–1 AP on most detectors.

Split of labor: the flip runs ON DEVICE (one extra jitted predict on the
mirrored canvas — the canvases are static, so the program is compiled once);
the unflip + merge run host-side in NumPy next to the evaluator, where the
per-image candidate counts are small (2 × max_detections) and dynamic shapes
are free.

Masks unflip by mirroring the box-frame crop; keypoints mirror x and swap
``keypoint_flip_pairs`` — the exact inverses of the training augmentation in
``data/preprocess.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def flip_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Mirror each canvas's VALID region (jit-safe; same construction as the
    training flip): padded columns stay in place, content mirrors within
    [0, w_img)."""
    image = batch["image"]

    def one(img, hw):
        w_img = hw[1]
        cols = jnp.arange(img.shape[1])
        src = jnp.where(cols < w_img, w_img - 1 - cols, cols).astype(
            jnp.int32
        )
        return img[:, src, :]

    out = dict(batch)
    out["image"] = jax.vmap(one)(image, batch["image_hw"])
    return out


def unflip_detections(
    out: Dict[str, np.ndarray],
    image_hw: np.ndarray,
    flip_pairs: Sequence[Tuple[int, int]] = (),
) -> Dict[str, np.ndarray]:
    """Map a mirrored-image prediction dict (host numpy, batched) back to
    original-image canvas coordinates."""
    res = dict(out)
    w = np.asarray(image_hw)[:, 1][:, None]  # [B, 1]
    b = out["boxes"]
    res["boxes"] = np.stack(
        [w - b[:, :, 2], b[:, :, 1], w - b[:, :, 0], b[:, :, 3]], axis=-1
    )
    if "masks" in out:
        res["masks"] = out["masks"][:, :, :, ::-1]
    if "keypoints" in out:
        kp = out["keypoints"].copy()
        kp[:, :, :, 0] = w[:, :, None] - kp[:, :, :, 0]
        if flip_pairs:
            perm = np.arange(kp.shape[2])
            for a_i, b_i in flip_pairs:
                perm[a_i], perm[b_i] = perm[b_i], perm[a_i]
            kp = kp[:, :, perm, :]
        res["keypoints"] = kp
    return res


def _nms_greedy(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    """Indices kept by plain greedy NMS (host-side, small candidate sets)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (
        boxes[:, 3] - boxes[:, 1]
    ).clip(0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = (x2 - x1).clip(0) * (y2 - y1).clip(0)
        union = areas[i] + areas - inter
        iou = np.divide(inter, union, out=np.zeros_like(inter),
                        where=union > 0)
        suppressed |= iou > thresh
    return np.asarray(keep, np.int64)


def merge_detections(
    a: Dict[str, np.ndarray],
    b: Dict[str, np.ndarray],
    image_index: int,
    nms_thresh: float,
    max_detections: int,
) -> Dict[str, np.ndarray]:
    """Merge one image's two candidate sets (original + unflipped mirror):
    concatenate valid rows, per-class greedy NMS, keep the top
    ``max_detections`` by score. Returns unbatched arrays (the evaluator's
    per-image view): boxes [n, 4], scores [n], classes [n] (+ masks /
    keypoints when present)."""
    i = image_index
    fields = {}
    for src in (a, b):
        v = src["valid"][i]
        for k in ("boxes", "scores", "classes", "masks", "keypoints"):
            if k in src:
                fields.setdefault(k, []).append(np.asarray(src[k][i])[v])
    cat = {k: np.concatenate(vs, axis=0) for k, vs in fields.items()}
    boxes, scores, classes = cat["boxes"], cat["scores"], cat["classes"]
    keep_all = []
    for c in np.unique(classes):
        idx = np.flatnonzero(classes == c)
        kept = _nms_greedy(boxes[idx], scores[idx], nms_thresh)
        keep_all.append(idx[kept])
    keep = (np.concatenate(keep_all)
            if keep_all else np.zeros(0, np.int64))
    keep = keep[np.argsort(-scores[keep], kind="stable")][:max_detections]
    return {k: v[keep] for k, v in cat.items()}
