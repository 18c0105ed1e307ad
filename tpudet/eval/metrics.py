"""VOC-style mAP evaluator (SURVEY.md C20) — host-side NumPy, deliberately
kept off-device: this is the parity referee ("VOC mAP@0.5 parity ±0.3"), so
it follows the canonical VOC protocol exactly rather than a tensorized
approximation.

Protocol (VOC devkit semantics):
  * detections matched per class, per image, greedily in descending score
    order to the unmatched GT with highest IoU ≥ threshold;
  * each GT matches at most one detection; extra matches are false positives;
  * GT marked difficult neither counts toward npos nor penalizes matches;
  * AP: 11-point interpolation (VOC2007) or all-point area-under-PR-envelope
    (VOC2010+/COCO-style), per EvalConfig.ap_interpolation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def average_precision(
    recall: np.ndarray, precision: np.ndarray, interpolation: str = "11_points"
) -> float:
    if interpolation == "11_points":
        ap = 0.0
        for t in np.linspace(0.0, 1.0, 11):
            mask = recall >= t
            ap += (precision[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    # All-point: area under the precision envelope.
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    changes = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[changes + 1] - mrec[changes]) * mpre[changes + 1]))


class DetectionEvaluator:
    def __init__(
        self,
        num_classes: int,
        iou_thresh: float = 0.5,
        interpolation: str = "11_points",
        class_names: Optional[Sequence[str]] = None,
    ):
        self.num_classes = num_classes
        self.iou_thresh = iou_thresh
        self.interpolation = interpolation
        self.class_names = class_names
        # Per class: score list, tp list (parallel), and positive-GT count.
        self._scores: List[List[float]] = [[] for _ in range(num_classes)]
        self._tps: List[List[bool]] = [[] for _ in range(num_classes)]
        self._npos = np.zeros(num_classes, np.int64)

    def add_image(
        self,
        pred_boxes: np.ndarray,     # [D, 4]
        pred_scores: np.ndarray,    # [D]
        pred_classes: np.ndarray,   # [D] in 1..C
        gt_boxes: np.ndarray,       # [G, 4]
        gt_classes: np.ndarray,     # [G] in 1..C
        gt_difficult: Optional[np.ndarray] = None,  # [G] bool
    ):
        if gt_difficult is None:
            gt_difficult = np.zeros(len(gt_boxes), bool)
        for c in range(1, self.num_classes + 1):
            det_mask = pred_classes == c
            gt_mask = gt_classes == c
            self._npos[c - 1] += int((~gt_difficult[gt_mask]).sum())

            d_boxes = pred_boxes[det_mask]
            d_scores = pred_scores[det_mask]
            g_boxes = gt_boxes[gt_mask]
            g_difficult = gt_difficult[gt_mask]
            order = np.argsort(-d_scores, kind="stable")
            matched = np.zeros(len(g_boxes), bool)
            iou = _iou_matrix(d_boxes, g_boxes) if len(g_boxes) else None
            for di in order:
                best, best_iou = -1, self.iou_thresh
                if iou is not None:
                    for gi in range(len(g_boxes)):
                        if iou[di, gi] >= best_iou and not matched[gi]:
                            best, best_iou = gi, iou[di, gi]
                if best >= 0:
                    matched[best] = True
                    if not g_difficult[best]:
                        self._scores[c - 1].append(float(d_scores[di]))
                        self._tps[c - 1].append(True)
                    # matches to difficult GT are silently dropped
                else:
                    self._scores[c - 1].append(float(d_scores[di]))
                    self._tps[c - 1].append(False)

    def summarize(self) -> Dict[str, float]:
        aps = {}
        for c in range(self.num_classes):
            npos = self._npos[c]
            name = (
                self.class_names[c] if self.class_names else f"class_{c + 1}"
            )
            if npos == 0:
                aps[name] = float("nan")
                continue
            scores = np.asarray(self._scores[c])
            tps = np.asarray(self._tps[c], bool)
            order = np.argsort(-scores, kind="stable")
            tps = tps[order]
            tp_cum = np.cumsum(tps)
            fp_cum = np.cumsum(~tps)
            recall = tp_cum / npos
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
            aps[name] = average_precision(recall, precision, self.interpolation)
        valid = [v for v in aps.values() if not np.isnan(v)]
        result = {f"AP/{k}": v for k, v in aps.items()}
        result["mAP"] = float(np.mean(valid)) if valid else 0.0
        return result


class CocoStyleEvaluator:
    """COCO-style mAP@[.5:.95] (BASELINE configs 4–5 are COCO): averages
    all-point AP over IoU thresholds 0.50:0.05:0.95. Implemented as a bank of
    per-threshold VOC-protocol evaluators (host-side, exactness over speed —
    same philosophy as the parity referee)."""

    THRESHOLDS = [0.5 + 0.05 * i for i in range(10)]

    def __init__(self, num_classes: int, class_names=None):
        self._banks = [
            DetectionEvaluator(
                num_classes, iou_thresh=t, interpolation="all_points",
                class_names=class_names,
            )
            for t in self.THRESHOLDS
        ]

    def add_image(self, *args, **kwargs):
        for bank in self._banks:
            bank.add_image(*args, **kwargs)

    def summarize(self) -> Dict[str, float]:
        maps = {}
        for t, bank in zip(self.THRESHOLDS, self._banks):
            maps[t] = bank.summarize()["mAP"]
        out = {
            "mAP": float(np.mean(list(maps.values()))),  # the COCO headline
            "mAP@0.5": maps[0.5],
            "mAP@0.75": maps[0.75],
        }
        # Per-class APs at 0.5 for debugging parity.
        out.update(
            {k: v for k, v in self._banks[0].summarize().items() if k != "mAP"}
        )
        return out
