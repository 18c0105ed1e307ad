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
    if interpolation == "101_points":
        # pycocotools convention: precision envelope sampled at 101 recall
        # points (0:0.01:1), zero past the last achieved recall.
        mpre = precision.copy()
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        pts = np.linspace(0.0, 1.0, 101)
        idx = np.searchsorted(recall, pts, side="left")
        vals = np.zeros(101)
        ok = idx < len(mpre)
        vals[ok] = mpre[idx[ok]]
        return float(vals.mean())
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
        mode: str = "voc",
        area_range: Optional[tuple] = None,
    ):
        """``mode="voc"`` (default) is the reference parity protocol.

        ``mode="coco"`` follows pycocotools matching: detections prefer
        non-ignored GT (VOC picks the best-IoU GT regardless and silently
        drops matches to difficult ones), and unmatched detections whose
        box area falls outside ``area_range`` are ignored rather than
        counted as false positives. ``area_range=(lo, hi)`` additionally
        marks GT with box area outside the range as ignored — this is how
        COCO's AP_small/medium/large are defined.
        """
        self.num_classes = num_classes
        self.iou_thresh = iou_thresh
        self.interpolation = interpolation
        self.class_names = class_names
        self.mode = mode
        self.area_range = area_range
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
        gt_ignore = gt_difficult.astype(bool).copy()
        det_out_of_range = np.zeros(len(pred_boxes), bool)
        if self.area_range is not None:
            lo, hi = self.area_range

            def _areas(b):
                return (np.maximum(b[:, 2] - b[:, 0], 0)
                        * np.maximum(b[:, 3] - b[:, 1], 0))

            ga = _areas(np.asarray(gt_boxes).reshape(-1, 4))
            gt_ignore |= (ga < lo) | (ga >= hi)
            da = _areas(np.asarray(pred_boxes).reshape(-1, 4))
            det_out_of_range = (da < lo) | (da >= hi)
        for c in range(1, self.num_classes + 1):
            det_mask = pred_classes == c
            gt_mask = gt_classes == c
            if not det_mask.any() and not gt_mask.any():
                continue  # nothing to match or count for this class
            self._npos[c - 1] += int((~gt_ignore[gt_mask]).sum())

            d_boxes = pred_boxes[det_mask]
            d_scores = pred_scores[det_mask]
            d_oor = det_out_of_range[det_mask]
            g_boxes = gt_boxes[gt_mask]
            g_ignore = gt_ignore[gt_mask]
            order = np.argsort(-d_scores, kind="stable")
            matched = np.zeros(len(g_boxes), bool)
            iou = _iou_matrix(d_boxes, g_boxes) if len(g_boxes) else None
            prefer_real = self.mode == "coco"
            for di in order:
                best, best_iou = -1, self.iou_thresh
                if iou is not None:
                    for gi in range(len(g_boxes)):
                        if matched[gi] or iou[di, gi] < best_iou:
                            continue
                        # COCO: never displace a non-ignored match with an
                        # ignored one (an ignored GT is only taken when no
                        # real GT clears the threshold).
                        if (prefer_real and g_ignore[gi]
                                and best >= 0 and not g_ignore[best]):
                            continue
                        if (prefer_real and not g_ignore[gi]
                                and best >= 0 and g_ignore[best]):
                            best, best_iou = gi, iou[di, gi]
                            continue
                        best, best_iou = gi, iou[di, gi]
                if best >= 0:
                    matched[best] = True
                    if not g_ignore[best]:
                        self._scores[c - 1].append(float(d_scores[di]))
                        self._tps[c - 1].append(True)
                    # matches to ignored/difficult GT are silently dropped
                elif self.mode == "coco" and d_oor[di]:
                    # Unmatched detection outside the area range: ignored
                    # (pycocotools), not a false positive.
                    pass
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

    def max_recalls(self) -> np.ndarray:
        """Per-class final recall (COCO AR@maxdets: recall achieved with all
        accumulated detections — callers cap detections per image upstream).
        NaN for classes with no positive GT."""
        out = np.full(self.num_classes, np.nan)
        for c in range(self.num_classes):
            if self._npos[c] > 0:
                out[c] = float(np.sum(self._tps[c])) / float(self._npos[c])
        return out


class CocoStyleEvaluator:
    """COCO-protocol evaluator (BASELINE configs 4–5 are COCO): AP averaged
    over IoU thresholds 0.50:0.05:0.95 with 101-point interpolation, the
    size-stratified APs (small/medium/large — pycocotools area breakpoints
    32² and 96², on box area), and AR@maxdets. Implemented as a bank of
    per-(threshold, area-range) COCO-mode evaluators (host-side NumPy,
    exactness over speed — same philosophy as the parity referee)."""

    THRESHOLDS = [0.5 + 0.05 * i for i in range(10)]
    AREA_RANGES = {
        "all": (0.0, 1e10),
        "small": (0.0, 32.0 ** 2),
        "medium": (32.0 ** 2, 96.0 ** 2),
        "large": (96.0 ** 2, 1e10),
    }

    def __init__(self, num_classes: int, class_names=None):
        self._banks: Dict[tuple, DetectionEvaluator] = {}
        for t in self.THRESHOLDS:
            for name, rng in self.AREA_RANGES.items():
                self._banks[(t, name)] = DetectionEvaluator(
                    num_classes, iou_thresh=t, interpolation="101_points",
                    class_names=class_names, mode="coco", area_range=rng,
                )

    def add_image(self, *args, **kwargs):
        for bank in self._banks.values():
            bank.add_image(*args, **kwargs)

    def _mean_ap(self, area: str) -> float:
        vals = [self._banks[(t, area)].summarize()["mAP"]
                for t in self.THRESHOLDS]
        return float(np.mean(vals))

    def _mean_ar(self, area: str) -> float:
        recalls = np.stack([self._banks[(t, area)].max_recalls()
                            for t in self.THRESHOLDS])
        per_class = np.nanmean(recalls, axis=0)
        valid = per_class[~np.isnan(per_class)]
        return float(valid.mean()) if len(valid) else 0.0

    def summarize(self) -> Dict[str, float]:
        out = {
            "mAP": self._mean_ap("all"),  # the COCO headline
            "mAP@0.5": self._banks[(0.5, "all")].summarize()["mAP"],
            "mAP@0.75": self._banks[(0.75, "all")].summarize()["mAP"],
            "mAP_small": self._mean_ap("small"),
            "mAP_medium": self._mean_ap("medium"),
            "mAP_large": self._mean_ap("large"),
            "AR": self._mean_ar("all"),
            "AR_small": self._mean_ar("small"),
            "AR_medium": self._mean_ar("medium"),
            "AR_large": self._mean_ar("large"),
        }
        # Per-class APs at 0.5 for debugging parity.
        out.update({
            k: v
            for k, v in self._banks[(0.5, "all")].summarize().items()
            if k != "mAP"
        })
        return out
