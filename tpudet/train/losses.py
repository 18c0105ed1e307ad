"""Detection losses (SURVEY.md C15).

RPN (Faster R-CNN §3.1.2, Eq. 1): binary cross-entropy objectness over the
sampled anchors + smooth-L1 on the positive anchors' deltas, both normalized
by the number of sampled anchors (the modern Detectron normalization of the
paper's N_cls/λ·N_reg scheme). RPN smooth-L1 uses β=1/9 (the classic σ=3).

Detection head (Fast R-CNN Eq. 1–3): softmax cross-entropy over C+1 classes +
smooth-L1 on the foreground rows' matched-class deltas, normalized by the
number of sampled RoIs.

All losses take explicit validity/positivity masks — the static-shape
counterpart of the reference's dynamic gather — and are safe for zero-valid
batches (return 0, not NaN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber): 0.5 x²/β for |x|<β else |x|-0.5β."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _safe_mean(values: jnp.ndarray, mask: jnp.ndarray, denom=None) -> jnp.ndarray:
    """Sum of masked values / denom (default: mask count); 0 if empty."""
    total = jnp.sum(values * mask)
    if denom is None:
        denom = jnp.sum(mask)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def rpn_losses(
    logits: jnp.ndarray,       # [K] objectness logits of sampled anchors
    deltas: jnp.ndarray,       # [K, 4] predicted deltas of sampled anchors
    target_deltas: jnp.ndarray,  # [K, 4] encoded GT (valid on positives)
    is_positive: jnp.ndarray,  # [K] bool
    valid: jnp.ndarray,        # [K] bool — real samples
    box_weight: float = 1.0,
    beta: float = 1.0 / 9.0,
):
    valid_f = valid.astype(jnp.float32)
    pos_f = (is_positive & valid).astype(jnp.float32)
    num_samples = jnp.sum(valid_f)

    labels = pos_f
    cls_per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )  # numerically-stable BCE with logits
    cls_loss = _safe_mean(cls_per, valid_f, denom=num_samples)

    box_per = jnp.sum(smooth_l1(deltas, target_deltas, beta), axis=-1)
    box_loss = _safe_mean(box_per, pos_f, denom=num_samples)
    return cls_loss, box_weight * box_loss


def detection_losses(
    cls_logits: jnp.ndarray,     # [R, C+1]
    deltas: jnp.ndarray,         # [R, C_box, 4] (C_box = C or 1 if agnostic)
    target_classes: jnp.ndarray,  # [R] int32, 0 = background
    target_deltas: jnp.ndarray,  # [R, 4]
    is_foreground: jnp.ndarray,  # [R] bool
    valid: jnp.ndarray,          # [R] bool
    beta: float = 1.0,
):
    valid_f = valid.astype(jnp.float32)
    fg_f = (is_foreground & valid).astype(jnp.float32)
    num_samples = jnp.sum(valid_f)

    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    cls_per = -jnp.take_along_axis(logp, target_classes[:, None], axis=1)[:, 0]
    cls_loss = _safe_mean(cls_per, valid_f, denom=num_samples)

    # Select each row's matched-class delta set (class c -> slot c-1; class-
    # agnostic heads have a single slot 0).
    if deltas.shape[1] == 1:
        sel = deltas[:, 0, :]
    else:
        slot = jnp.clip(target_classes - 1, 0, deltas.shape[1] - 1)
        sel = jnp.take_along_axis(deltas, slot[:, None, None], axis=1)[:, 0, :]
    box_per = jnp.sum(smooth_l1(sel, target_deltas, beta), axis=-1)
    box_loss = _safe_mean(box_per, fg_f, denom=num_samples)
    return cls_loss, box_loss
