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
