"""Pallas TPU kernels for the proposal/RoI hot path (SURVEY.md C10/C12/C16:
"anchor generation, box decoding, top-k proposal selection, NMS, and RoI Align
become hand-written Pallas kernels").

Each kernel has a pure-jnp XLA fallback in ``tpudet.ops`` (its correctness
oracle); dispatchers pick the Pallas path on TPU backends when
``use_pallas`` is set and fall back otherwise (CPU tests, interpret mode)."""

from __future__ import annotations

import contextlib

import jax

from tpudet.ops.nms import nms as _nms_jnp

# Lowering-context override: jax.export can lower Mosaic kernels for the
# 'tpu' platform from any host (verified — the kernel serializes into the
# StableHLO as a custom call), but ``jax.default_backend()`` reports the
# HOST backend, so host-keyed dispatch would wrongly bake the XLA fallbacks
# into a cross-host export. The exporter wraps tracing in
# ``assume_tpu_lowering`` to route dispatch by the TARGET platform.
_FORCE_TPU_LOWERING = False
_FORCE_XLA_LOWERING = False


@contextlib.contextmanager
def assume_tpu_lowering():
    """Treat dispatch as TPU for the duration (cross-host export tracing)."""
    global _FORCE_TPU_LOWERING
    prev = _FORCE_TPU_LOWERING
    _FORCE_TPU_LOWERING = True
    try:
        yield
    finally:
        _FORCE_TPU_LOWERING = prev


@contextlib.contextmanager
def assume_xla_lowering():
    """Force the portable XLA fallbacks for the duration. Used for
    mixed-platform exports traced ON a TPU host: a Mosaic custom call has
    no CPU/CUDA lowering, so a ('tpu','cpu') artifact must carry the XLA
    paths even though the host backend is TPU. Takes precedence over
    ``assume_tpu_lowering`` and the host backend."""
    global _FORCE_XLA_LOWERING
    prev = _FORCE_XLA_LOWERING
    _FORCE_XLA_LOWERING = True
    try:
        yield
    finally:
        _FORCE_XLA_LOWERING = prev


def on_tpu_lowering() -> bool:
    """True when tracing/lowering targets TPU: either the host backend IS
    the TPU, or an export context declared a TPU target platform."""
    if _FORCE_XLA_LOWERING:
        return False
    return _FORCE_TPU_LOWERING or jax.default_backend() == "tpu"


def _on_tpu() -> bool:
    return on_tpu_lowering()


def nms_dispatch(boxes, scores, iou_threshold, max_outputs, valid_mask=None,
                 score_threshold=None, use_pallas=True, presorted=False):
    """NMS: Pallas kernel on TPU, jnp reference elsewhere.

    ``presorted`` promises descending scores; the kernel then skips its
    internal re-sort + box gather. A pure optimization hint — the jnp
    reference ignores it (its own sort is a no-op reorder in that case and
    selection is identical)."""
    if use_pallas and _on_tpu():
        try:
            from tpudet.kernels.nms import nms_pallas

            return nms_pallas(
                boxes, scores, iou_threshold, max_outputs,
                valid_mask=valid_mask, score_threshold=score_threshold,
                presorted=presorted,
            )
        except ImportError:
            pass
    return _nms_jnp(
        boxes, scores, iou_threshold, max_outputs,
        valid_mask=valid_mask, score_threshold=score_threshold,
    )


def batched_nms_dispatch(boxes, scores, class_ids, iou_threshold, max_outputs,
                         valid_mask=None, score_threshold=None,
                         use_pallas=True, coordinate_offset=4096.0):
    """Per-class NMS via the class-offset trick, on the dispatched kernel.

    ``coordinate_offset`` must exceed the max box coordinate (boxes are
    clipped to the canvas, <= 1344 in the presets) but stay small enough
    that f32 keeps sub-pixel resolution after the shift: at 80 classes x
    4096 the largest coordinate is ~3.3e5, where f32 spacing is 0.03 px.
    (The previous 1e5 pushed coords to ~8e6, where spacing is 0.5 px —
    visibly perturbing IoU against an exact per-class NMS.)"""
    offsets = class_ids.astype(boxes.dtype)[:, None] * coordinate_offset
    return nms_dispatch(
        boxes + offsets, scores, iou_threshold, max_outputs,
        valid_mask=valid_mask, score_threshold=score_threshold,
        use_pallas=use_pallas,
    )


def class_aware_select(boxes, scores, class_ids, iou_threshold, max_outputs,
                       *, method="hard", sigma=0.5, prune_threshold=0.0,
                       valid_mask=None, use_pallas=True,
                       coordinate_offset=4096.0):
    """Shared tail of every NMS-based family's postprocess: one class-aware
    selection over flat (box, score, class) candidates.

    ``method``: "hard" (greedy suppression — the reference protocol, via
    the Pallas/jnp dispatch) or "soft_linear"/"soft_gaussian"
    (``tpudet.ops.nms.soft_nms`` score decay; jnp only — an accuracy knob,
    not the throughput path).

    Returns ``(indices [D] int32, out_scores [D], valid [D] bool)`` —
    out_scores are the ORIGINAL scores for hard and the DECAYED scores for
    soft, zeroed where invalid, so callers report them directly and gather
    boxes/classes through ``indices`` either way."""
    import jax.numpy as jnp

    if method == "hard":
        keep, valid = batched_nms_dispatch(
            boxes, scores, class_ids, iou_threshold, max_outputs,
            valid_mask=valid_mask, use_pallas=use_pallas,
            coordinate_offset=coordinate_offset,
        )
        return keep, jnp.where(valid, scores[keep], 0.0), valid
    if method not in ("soft_linear", "soft_gaussian"):
        raise ValueError(
            f"nms_method must be 'hard', 'soft_linear' or 'soft_gaussian', "
            f"got {method!r}"
        )
    from tpudet.ops.nms import batched_soft_nms

    return batched_soft_nms(
        boxes, scores, class_ids, iou_threshold, max_outputs,
        method=method.removeprefix("soft_"), sigma=sigma,
        valid_mask=valid_mask, prune_threshold=prune_threshold,
        coordinate_offset=coordinate_offset,
    )
