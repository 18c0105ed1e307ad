"""Panoptic fusion + Panoptic Quality (Kirillov et al., arXiv:1801.00868 /
1901.02446 §4) — all host-side NumPy, like the mAP referee: segment counts
are dynamic and tiny, exactly what the host is for.

Everything runs at the semantic branch's 1/4 canvas scale: instance
box-frame masks paste at boxes/4 (the same crops the segm evaluator
pastes at full scale), the semantic map is already 1/4, and PQ is
scale-invariant under common resampling.

Unified category space: 1..S stuff, S+1..S+C things (S =
data.num_stuff_classes, C = data.num_classes)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _paste_quarter(mask: np.ndarray, box: np.ndarray, hw: Tuple[int, int],
                   thresh: float = 0.5) -> np.ndarray:
    """Box-frame mask probabilities -> binary [H4, W4] canvas mask at 1/4
    scale (nearest resample of the crop into the quarter-scale box)."""
    h4, w4 = hw
    out = np.zeros((h4, w4), bool)
    x1, y1, x2, y2 = [v / 4.0 for v in box]
    ix1, iy1 = max(int(np.floor(x1)), 0), max(int(np.floor(y1)), 0)
    ix2, iy2 = min(int(np.ceil(x2)), w4), min(int(np.ceil(y2)), h4)
    if ix2 <= ix1 or iy2 <= iy1:
        return out
    m = np.asarray(mask)
    mh, mw = m.shape
    ys = np.clip(((np.arange(iy1, iy2) + 0.5 - y1)
                  / max(y2 - y1, 1e-6) * mh).astype(np.int64), 0, mh - 1)
    xs = np.clip(((np.arange(ix1, ix2) + 0.5 - x1)
                  / max(x2 - x1, 1e-6) * mw).astype(np.int64), 0, mw - 1)
    out[iy1:iy2, ix1:ix2] = m[ys[:, None], xs[None, :]] > thresh
    return out


def fuse_panoptic(
    boxes: np.ndarray,      # [n, 4] CANVAS coords
    scores: np.ndarray,     # [n]
    classes: np.ndarray,    # [n] thing classes 1..C
    masks: np.ndarray,      # [n, m, m] box-frame probabilities
    semantic: np.ndarray,   # [H4, W4] labels 1..S+C (argmax + 1)
    num_stuff: int,
    overlap_thresh: float = 0.5,
    stuff_min_area: int = 64,
    score_thresh: float = 0.5,
) -> Tuple[np.ndarray, List[Dict]]:
    """The paper's merge heuristic: paste instances by descending score
    (an instance is dropped when more than ``overlap_thresh`` of it is
    already claimed), then fill each stuff class from the semantic map
    where unclaimed (kept only above ``stuff_min_area`` pixels). Returns
    (segment-id map [H4, W4] int32 — 0 = void, segments list of
    {"id", "category", "isthing"})."""
    semantic = np.asarray(semantic)
    seg = np.zeros(semantic.shape, np.int32)
    segments: List[Dict] = []
    next_id = 1
    order = np.argsort(-np.asarray(scores), kind="stable")
    for i in order:
        if scores[i] < score_thresh:
            continue
        m = _paste_quarter(masks[i], boxes[i], semantic.shape)
        area = int(m.sum())
        if area == 0:
            continue
        claimed = int((m & (seg > 0)).sum())
        if claimed / area > overlap_thresh:
            continue
        m = m & (seg == 0)
        if not m.any():
            continue
        seg[m] = next_id
        segments.append({"id": next_id,
                         "category": num_stuff + int(classes[i]),
                         "isthing": True})
        next_id += 1
    for s in range(1, num_stuff + 1):
        region = (semantic == s) & (seg == 0)
        if int(region.sum()) >= stuff_min_area:
            seg[region] = next_id
            segments.append({"id": next_id, "category": s,
                             "isthing": False})
            next_id += 1
    return seg, segments


def gt_panoptic(
    gt_boxes: np.ndarray,    # [g, 4] CANVAS coords
    gt_classes: np.ndarray,  # [g] thing classes 1..C
    gt_masks: np.ndarray,    # [g, M, M] box-frame binary crops
    gt_semantic: np.ndarray,  # [H4, W4] labels, 0 void
    num_stuff: int,
) -> Tuple[np.ndarray, List[Dict]]:
    """Assemble the GT panoptic map from the loader's per-modality GT:
    instance crops paste on top (later instances occlude — the synthetic
    renderer's draw order), stuff fills from the semantic map, void (0)
    stays void."""
    gt_semantic = np.asarray(gt_semantic)
    seg = np.zeros(gt_semantic.shape, np.int32)
    segments: List[Dict] = []
    next_id = 1
    for s in range(1, num_stuff + 1):
        region = gt_semantic == s
        if region.any():
            seg[region] = next_id
            segments.append({"id": next_id, "category": s,
                             "isthing": False})
            next_id += 1
    for i in range(len(gt_boxes)):
        m = _paste_quarter(gt_masks[i], gt_boxes[i], gt_semantic.shape)
        m = m & (gt_semantic > 0)  # never claim void (padding)
        if not m.any():
            continue
        seg[m] = next_id
        segments.append({"id": next_id,
                         "category": num_stuff + int(gt_classes[i]),
                         "isthing": True})
        next_id += 1
    return seg, segments


class PanopticEvaluator:
    """PQ/SQ/RQ (arXiv:1801.00868 §4) + semantic mIoU accumulation.

    Matching follows the PQ spec exactly: a (pred, GT) pair of the same
    category matches iff IoU > 0.5 (the theorem guarantees uniqueness);
    void pixels are excluded from the IoU union; unmatched predictions
    overlapping void by more than half are discarded, not false
    positives."""

    def __init__(self, num_stuff: int, num_things: int):
        self.num_stuff = num_stuff
        self.num_things = num_things
        n = num_stuff + num_things + 1
        self._iou_sum = np.zeros(n)
        self._tp = np.zeros(n, np.int64)
        self._fp = np.zeros(n, np.int64)
        self._fn = np.zeros(n, np.int64)
        # Semantic confusion for mIoU (rows GT, cols pred; label 0 = void
        # excluded).
        self._conf = np.zeros((n, n), np.int64)

    def add_image(self, pred_seg, pred_segments, gt_seg, gt_segments,
                  pred_semantic=None, gt_semantic=None):
        pred_seg = np.asarray(pred_seg)
        gt_seg = np.asarray(gt_seg)
        void = gt_seg == 0
        p_area = {s["id"]: int((pred_seg == s["id"]).sum())
                  for s in pred_segments}
        g_area = {s["id"]: int((gt_seg == s["id"]).sum())
                  for s in gt_segments}
        p_cat = {s["id"]: s["category"] for s in pred_segments}
        g_cat = {s["id"]: s["category"] for s in gt_segments}
        # Pairwise intersections via the combined-label trick.
        both = (gt_seg > 0) & (pred_seg > 0)
        combo = gt_seg[both].astype(np.int64) * (1 << 32) + pred_seg[both]
        pairs, counts = np.unique(combo, return_counts=True)
        inter = {(int(c >> 32), int(c & 0xFFFFFFFF)): int(n)
                 for c, n in zip(pairs, counts)}
        # Void overlap per predicted segment (for the discard rule).
        pv = pred_seg[void]
        v_ids, v_counts = np.unique(pv[pv > 0], return_counts=True)
        void_overlap = dict(zip(v_ids.tolist(), v_counts.tolist()))

        matched_p, matched_g = set(), set()
        for (gid, pid), i in inter.items():
            if g_cat[gid] != p_cat.get(pid):
                continue
            union = (p_area[pid] + g_area[gid] - i
                     - void_overlap.get(pid, 0))
            iou = i / union if union > 0 else 0.0
            if iou > 0.5:
                c = g_cat[gid]
                self._tp[c] += 1
                self._iou_sum[c] += iou
                matched_p.add(pid)
                matched_g.add(gid)
        for gid, cat in g_cat.items():
            if gid not in matched_g and g_area[gid] > 0:
                self._fn[cat] += 1
        for pid, cat in p_cat.items():
            if pid in matched_p or p_area[pid] == 0:
                continue
            if void_overlap.get(pid, 0) / p_area[pid] > 0.5:
                continue  # mostly-void prediction: ignored by the spec
            self._fp[cat] += 1

        if pred_semantic is not None and gt_semantic is not None:
            ps = np.asarray(pred_semantic).ravel()
            gs = np.asarray(gt_semantic).ravel()
            keep = gs > 0
            np.add.at(self._conf, (gs[keep], ps[keep]), 1)

    def _bank(self, cats):
        pq, sq, rq, present = [], [], [], 0
        for c in cats:
            denom = self._tp[c] + self._fp[c] / 2.0 + self._fn[c] / 2.0
            if denom == 0:
                continue
            present += 1
            pq.append(self._iou_sum[c] / denom)
            sq.append(self._iou_sum[c] / self._tp[c]
                      if self._tp[c] else 0.0)
            rq.append(self._tp[c] / denom)
        if not present:
            return 0.0, 0.0, 0.0
        return (float(np.mean(pq)), float(np.mean(sq)), float(np.mean(rq)))

    def summarize(self) -> Dict[str, float]:
        s, t = self.num_stuff, self.num_things
        all_pq = self._bank(range(1, s + t + 1))
        st_pq = self._bank(range(1, s + 1))
        th_pq = self._bank(range(s + 1, s + t + 1))
        out = {
            "PQ": all_pq[0], "SQ": all_pq[1], "RQ": all_pq[2],
            "PQ_stuff": st_pq[0], "PQ_things": th_pq[0],
        }
        # Semantic mIoU over labels present in GT.
        inter = np.diag(self._conf).astype(np.float64)
        union = (self._conf.sum(0) + self._conf.sum(1) - np.diag(self._conf)
                 ).astype(np.float64)
        present = self._conf.sum(1) > 0
        if present.any():
            out["semantic_mIoU"] = float(
                (inter[present] / np.maximum(union[present], 1)).mean()
            )
        else:
            out["semantic_mIoU"] = 0.0
        return out
