"""Non-maximum suppression, static-shape jnp reference path (SURVEY.md C10/C16).

Exact greedy NMS (identical selection to ``tf.image.non_max_suppression``:
sort by score descending, ties broken toward the lower index, sequentially
keep a box iff it overlaps no previously-kept box above ``iou_threshold``).

TPU/XLA constraints shape the formulation:
  * static shapes: output is always ``[max_outputs]`` indices + validity mask;
  * no data-dependent shapes: suppression runs as a ``lax.fori_loop`` over all
    N candidates with a vectorized O(N) inner step (no N×N IoU matrix is ever
    materialized, so memory stays O(N));
  * the sequential-dependency hot path is the Pallas kernel in
    ``tpudet.kernels.nms`` — this module is its correctness oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _iou_one_vs_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one [4] box against [N, 4] boxes -> [N]."""
    a1 = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    a2 = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: Optional[jnp.ndarray] = None,
    score_threshold: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over [N, 4] boxes / [N] scores.

    Returns ``(indices [max_outputs] int32, valid [max_outputs] bool)`` —
    indices into the *input* order, highest score first; ``valid`` marks real
    selections (False entries point at index 0 and must be masked by callers).
    """
    n = boxes.shape[0]
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    if score_threshold is not None:
        scores = jnp.where(scores > score_threshold, scores, NEG_INF)

    # Sort descending by score (ties -> lower original index first).
    sorted_scores, order = jax.lax.top_k(scores, n)
    sorted_boxes = boxes[order]
    candidate = sorted_scores > NEG_INF / 2  # real (unmasked) entries

    def body(i, keep):
        iou_i = _iou_one_vs_many(sorted_boxes[i], sorted_boxes)
        earlier = jnp.arange(n) < i
        suppressed = jnp.any(keep & earlier & (iou_i > iou_threshold))
        keep_i = candidate[i] & ~suppressed
        return keep.at[i].set(keep_i)

    keep = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))

    # First ``max_outputs`` kept boxes, in score order: give each kept sorted
    # position a strictly decreasing priority and top_k them.
    return _select_kept(keep, order, max_outputs)


def _select_kept(keep: jnp.ndarray, order: jnp.ndarray, max_outputs: int):
    """Sorted keep mask + sort order -> (indices [max_outputs], valid).

    Handles max_outputs > N by padding with invalid slots (the output shape
    contract is always [max_outputs])."""
    n = keep.shape[0]
    k = min(max_outputs, n)
    priority = jnp.where(keep, (n - jnp.arange(n)).astype(jnp.int32), 0)
    top_priority, positions = jax.lax.top_k(priority, k)
    valid = top_priority > 0
    indices = jnp.where(valid, order[positions], 0).astype(jnp.int32)
    if k < max_outputs:
        pad = max_outputs - k
        indices = jnp.concatenate([indices, jnp.zeros(pad, jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return indices, valid


def coordinate_offset_for(max_coord: float) -> float:
    """Class-offset stride for :func:`batched_nms`, derived from the largest
    possible box coordinate (canvas size): the next power of two above
    ``max_coord``, at least 4096.

    Guards the offset trick's precondition — boxes from adjacent
    class/level bands must never overlap, so the stride must exceed every
    coordinate. Power-of-two keeps offset arithmetic exact in f32; even at
    8192 x 80 classes the largest shifted coordinate is ~6.6e5, where f32
    spacing is 0.0625 px — still sub-pixel for IoU comparisons."""
    out = 4096.0
    while out <= max_coord:
        out *= 2.0
    return out


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    method: str = "gaussian",
    sigma: float = 0.5,
    valid_mask: Optional[jnp.ndarray] = None,
    prune_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al., arXiv:1704.04503 Alg. 1): instead of
    removing boxes that overlap an accepted detection, DECAY their scores —
    ``gaussian``: ``s *= exp(-iou^2 / sigma)`` (the paper's recommended
    form, threshold-free); ``linear``: ``s *= 1 - iou`` when
    ``iou > iou_threshold`` (strict ``>``, matching this module's hard-NMS
    suppression convention).

    TPU formulation: the paper's while-loop becomes a ``lax.scan`` of
    exactly ``max_outputs`` steps — each step is one VPU argmax over [N] +
    one vectorized one-vs-many IoU + one multiplicative decay. No dynamic
    shapes, no N x N IoU matrix, O(D * N) work; this is an accuracy knob
    for eval/serving (the paper's +1 mAP on COCO), not the throughput
    path, so there is deliberately no Pallas variant (the hard kernel in
    ``tpudet.kernels.nms`` covers the hot proposal loop).

    Returns ``(indices [max_outputs] int32, rescored [max_outputs],
    valid [max_outputs] bool)``. Unlike hard NMS the OUTPUT scores differ
    from the input scores — callers must report ``rescored``, not a gather
    of the originals. Picked scores are non-increasing (each pick is the
    argmax of a sequence that only decays), so the output is score-sorted.
    A pick is valid iff its decayed score exceeds ``prune_threshold``
    (callers pass their family's ``score_thresh``); invalid entries point
    at index 0 with score 0 and form a suffix.
    """
    del_score = jnp.float32(NEG_INF)
    s = scores.astype(jnp.float32)
    if valid_mask is not None:
        s = jnp.where(valid_mask, s, del_score)

    def body(s, _):
        i = jnp.argmax(s)
        si = s[i]
        iou = _iou_one_vs_many(boxes[i].astype(jnp.float32),
                               boxes.astype(jnp.float32))
        if method == "linear":
            decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        else:
            decay = jnp.exp(-(iou * iou) / sigma)
        # Decay live entries only: a dead entry's sentinel times a ~0 decay
        # would otherwise NaN (NEG_INF * 0).
        alive = s > del_score / 2
        s = jnp.where(alive, s * decay, del_score)
        s = s.at[i].set(del_score)
        return s, (i.astype(jnp.int32), si)

    _, (idx, picked) = jax.lax.scan(
        body, s, None, length=max_outputs
    )
    valid = picked > prune_threshold
    return (
        jnp.where(valid, idx, 0),
        jnp.where(valid, picked, 0.0),
        valid,
    )


def batched_soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    method: str = "gaussian",
    sigma: float = 0.5,
    valid_mask: Optional[jnp.ndarray] = None,
    prune_threshold: float = 0.0,
    coordinate_offset: float = 4096.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class soft-NMS via the same class-offset trick as
    :func:`batched_nms`: boxes shifted to disjoint per-class coordinate
    bands have cross-class IoU exactly 0, so the decay factor is exactly 1
    for both methods (``1 - 0`` never triggers the linear threshold;
    ``exp(0) = 1``) — cross-class detections never rescore each other,
    which is precisely the per-class protocol."""
    offsets = class_ids.astype(boxes.dtype)[:, None] * coordinate_offset
    return soft_nms(
        boxes + offsets, scores, iou_threshold, max_outputs,
        method=method, sigma=sigma, valid_mask=valid_mask,
        prune_threshold=prune_threshold,
    )


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: Optional[jnp.ndarray] = None,
    score_threshold: Optional[float] = None,
    coordinate_offset: float = 4096.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class NMS in one pass: offset each class's boxes to a disjoint
    coordinate range so cross-class pairs never overlap (standard trick), then
    run plain :func:`nms`.

    ``coordinate_offset`` must exceed the max box coordinate but stay small
    enough that offset coordinates keep f32 resolution: at 4096 with 80
    classes the largest coordinate is ~3.3e5, where f32 spacing is 0.03 px
    (1e5 would put class-80 boxes at ~8e6, f32 spacing 0.5 px — enough to
    flip near-threshold IoU comparisons)."""
    offsets = class_ids.astype(boxes.dtype)[:, None] * coordinate_offset
    return nms(
        boxes + offsets,
        scores,
        iou_threshold,
        max_outputs,
        valid_mask=valid_mask,
        score_threshold=score_threshold,
    )
