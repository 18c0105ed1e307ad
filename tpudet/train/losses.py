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


def retinanet_losses(
    cls_logits: jnp.ndarray,      # [N, C] per-anchor per-class logits
    deltas: jnp.ndarray,          # [N, 4] predicted deltas
    target_classes: jnp.ndarray,  # [N] int32, 0 = background, 1..C fg
    target_deltas: jnp.ndarray,   # [N, 4] encoded GT (valid on positives)
    labels: jnp.ndarray,          # [N] int32 — 1 fg, 0 bg, -1 ignored
    alpha: float = 0.25,
    gamma: float = 2.0,
    box_weight: float = 1.0,
    beta: float = 0.11,
):
    """RetinaNet losses (arXiv:1708.02002 Eq. 4–5): sigmoid focal loss over
    ALL non-ignored anchors + smooth-L1 on the positives' deltas, both
    normalized by the positive count (the paper's normalization — the focal
    term already downweights the ~100k easy negatives, so no sampling).

    Stable focal form: per-class BCE-with-logits x α_t (1 − p_t)^γ, with
    p_t = p on the target-class element and 1 − p elsewhere. Safe for
    zero-positive images (normalizer clamped to 1, box term 0)."""
    n, num_classes = cls_logits.shape
    use = (labels >= 0).astype(jnp.float32)  # ignored anchors drop out
    pos = (labels == 1).astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    # One-hot fg targets: background rows are all-zeros (pure negatives).
    onehot = (
        jax.nn.one_hot(target_classes - 1, num_classes, dtype=jnp.float32)
        * pos[:, None]
    )
    bce = (
        jnp.maximum(cls_logits, 0)
        - cls_logits * onehot
        + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    )
    p = jax.nn.sigmoid(cls_logits)
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    alpha_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    focal = alpha_t * jnp.power(1.0 - p_t, gamma) * bce  # [N, C]
    cls_loss = jnp.sum(focal * use[:, None]) / num_pos

    box_per = jnp.sum(smooth_l1(deltas, target_deltas, beta), axis=-1)
    box_loss = jnp.sum(box_per * pos) / num_pos
    return cls_loss, box_weight * box_loss


def fcos_losses(
    cls_logits: jnp.ndarray,    # [N, C] per-location class logits
    pred_boxes: jnp.ndarray,    # [N, 4] DECODED predicted boxes
    ctr_logits: jnp.ndarray,    # [N] centerness logits
    target_classes: jnp.ndarray,  # [N] int32, 0 bg, 1..C fg
    target_boxes: jnp.ndarray,  # [N, 4] matched GT boxes (valid on positives)
    target_ctr: jnp.ndarray,    # [N] centerness targets in [0,1] (positives)
    pos: jnp.ndarray,           # [N] bool
    alpha: float = 0.25,
    gamma: float = 2.0,
    box_weight: float = 1.0,
    ctr_weight: float = 1.0,
):
    """FCOS losses (Tian et al., arXiv:1904.01355 Eq. 2 + §3.2):
    sigmoid focal classification over ALL locations (no ignore band — the
    per-location assignment is exhaustive), 1 − GIoU on the positives'
    DECODED boxes weighted by the centerness target and normalized by its
    sum (the paper's "centerness-weighted" GIoU — low-quality border
    locations contribute less), and BCE centerness on positives normalized
    by the positive count. Safe for zero-positive images."""
    from tpudet.ops.boxes import elementwise_giou

    n, num_classes = cls_logits.shape
    pos_f = pos.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos_f), 1.0)

    onehot = (
        jax.nn.one_hot(target_classes - 1, num_classes, dtype=jnp.float32)
        * pos_f[:, None]
    )
    bce = (
        jnp.maximum(cls_logits, 0)
        - cls_logits * onehot
        + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    )
    p = jax.nn.sigmoid(cls_logits)
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    alpha_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    cls_loss = jnp.sum(alpha_t * jnp.power(1.0 - p_t, gamma) * bce) / num_pos

    giou = elementwise_giou(pred_boxes, target_boxes)  # [N]
    ctr_w = target_ctr * pos_f
    box_loss = jnp.sum((1.0 - giou) * ctr_w) / jnp.maximum(
        jnp.sum(ctr_w), 1e-6
    )
    box_loss = jnp.where(jnp.sum(pos_f) > 0, box_loss, 0.0)

    ctr_bce = (
        jnp.maximum(ctr_logits, 0)
        - ctr_logits * target_ctr
        + jnp.log1p(jnp.exp(-jnp.abs(ctr_logits)))
    )
    ctr_loss = _safe_mean(ctr_bce, pos_f, denom=num_pos)
    return cls_loss, box_weight * box_loss, ctr_weight * ctr_loss


def mask_loss(
    mask_logits: jnp.ndarray,     # [R, m, m, C] per-class mask logits
    targets: jnp.ndarray,         # [R, m, m] binary targets (fg rows valid)
    target_classes: jnp.ndarray,  # [R] int32 matched class (1..C)
    fg_valid: jnp.ndarray,        # [R] bool — foreground AND valid sample
) -> jnp.ndarray:
    """Mask R-CNN mask loss (arXiv:1703.06870 §3, L_mask): per-pixel sigmoid
    BCE on the MATCHED class's mask only — per-class sigmoid decouples mask
    and class prediction (no cross-class competition, unlike per-pixel
    softmax). Averaged over pixels within each RoI, then over the foreground
    RoIs; background/invalid rows contribute nothing. Safe for zero-fg
    images (returns 0)."""
    if mask_logits.shape[-1] == 1:
        logits = mask_logits[..., 0]  # class-agnostic head
    else:
        slot = jnp.clip(target_classes - 1, 0, mask_logits.shape[-1] - 1)
        logits = jnp.take_along_axis(
            mask_logits, slot[:, None, None, None], axis=-1
        )[..., 0]
    bce = (
        jnp.maximum(logits, 0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )  # [R, m, m]
    per_roi = jnp.mean(bce, axis=(1, 2))
    return _safe_mean(per_roi, fg_valid.astype(jnp.float32))


def semantic_loss(
    logits: jnp.ndarray,   # [B, H, W, C] semantic logits
    targets: jnp.ndarray,  # [B, H, W] int32 labels, 0 = void/ignore
) -> jnp.ndarray:
    """Panoptic FPN semantic term (arXiv:1901.02446 §3): per-pixel softmax
    cross-entropy; label 0 (void — canvas padding, unlabeled COCO pixels)
    drops out of the mean. Safe for all-void images."""
    c = logits.shape[-1]
    valid = (targets > 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    slot = jnp.clip(targets - 1, 0, c - 1)
    ce = -jnp.take_along_axis(logp, slot[..., None], axis=-1)[..., 0]
    return _safe_mean(ce, valid)


def keypoint_loss(
    logits: jnp.ndarray,     # [R, S, S, K] heatmap logits
    target_idx: jnp.ndarray,  # [R, K] int32 flat grid index of the keypoint
    target_valid: jnp.ndarray,  # [R, K] bool — visible AND inside the RoI
    fg_valid: jnp.ndarray,   # [R] bool — foreground AND valid sample
) -> jnp.ndarray:
    """Keypoint R-CNN loss (arXiv:1703.06870 §5): each visible keypoint is a
    one-hot class over the S² heatmap grid — softmax cross-entropy per
    (RoI, keypoint), averaged over the visible keypoints of foreground RoIs
    (the paper/Detectron normalization). Safe for zero-visible images."""
    r, s1, s2, k = logits.shape
    flat = logits.reshape(r, s1 * s2, k).transpose(0, 2, 1)  # [R, K, S²]
    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -jnp.take_along_axis(logp, target_idx[..., None], axis=-1)[..., 0]
    use = (target_valid & fg_valid[:, None]).astype(jnp.float32)
    return _safe_mean(ce, use)


def detr_set_loss(
    logits: jnp.ndarray,      # [Q, C+1] query class logits (0 = no-object)
    pred_boxes: jnp.ndarray,  # [Q, 4] normalized (cx, cy, w, h) in [0, 1]
    gt_boxes: jnp.ndarray,    # [G, 4] normalized (cx, cy, w, h), padded
    gt_classes: jnp.ndarray,  # [G] int32 1..C (padding rows arbitrary)
    gt_valid: jnp.ndarray,    # [G] bool
    cost_class: float,
    cost_bbox: float,
    cost_giou: float,
    eos_coef: float,
):
    """One image's DETR set-prediction loss (Carion et al.,
    arXiv:2005.12872 §2): Hungarian-match queries↔GT under the
    class-prob + L1 + GIoU cost, then CE over ALL queries (no-object
    down-weighted by ``eos_coef``) + L1 + (1 − GIoU) on the matched pairs.

    Static shapes throughout: padded GT rows are excluded from the
    matching itself (``hungarian_masked`` processes valid rows only —
    their sentinel matches are dropped by the class scatter and masked
    out of the box terms), so the matcher's sequential trip count scales
    with the REAL object count, not the padded G.

    Returns per-image SUMS (``ce_sum, ce_weight_sum, l1_sum, giou_sum,
    num_pos``) so the caller can apply the paper's batch-level
    normalization (CE: weighted mean over every query in the batch; box
    terms: total matched-pair count across the batch)."""
    from tpudet.ops.boxes import (
        cxcywh_to_xyxy,
        elementwise_giou,
        pairwise_giou,
    )

    num_queries = logits.shape[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    # --- matching cost [G, Q] (gradients never flow through the matcher) --
    c_class = -probs[:, gt_classes].T                       # [G, Q]
    c_bbox = jnp.sum(
        jnp.abs(gt_boxes[:, None, :] - pred_boxes[None, :, :]), axis=-1
    )
    c_giou = -pairwise_giou(
        cxcywh_to_xyxy(gt_boxes), cxcywh_to_xyxy(pred_boxes)
    )
    cost = cost_class * c_class + cost_bbox * c_bbox + cost_giou * c_giou
    cost = jnp.where(gt_valid[:, None], cost, 0.0)
    from tpudet.ops.hungarian import hungarian_masked

    # Valid rows only: the padded-G row scan was the train step's lockstep
    # latency wall under the (layers x batch) vmap (KERNELS.md "DETR
    # training"). Invalid rows get the out-of-bounds sentinel Q — the
    # scatter below drops them; the pred_boxes gather clamps and the box
    # terms are valid-masked.
    match = hungarian_masked(jax.lax.stop_gradient(cost), gt_valid)

    # --- classification: CE over all queries, eos_coef on no-object -------
    tgt_cls = jnp.zeros((num_queries,), jnp.int32).at[match].set(
        gt_classes, mode="drop"
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -logp[jnp.arange(num_queries), tgt_cls]
    w = jnp.where(tgt_cls > 0, 1.0, eos_coef)
    ce_sum = jnp.sum(ce * w)
    ce_weight_sum = jnp.sum(w)

    # --- box terms on the matched valid pairs -----------------------------
    matched = pred_boxes[match]                             # [G, 4]
    valid_f = gt_valid.astype(jnp.float32)
    l1 = jnp.sum(jnp.abs(matched - gt_boxes), axis=-1)
    giou = elementwise_giou(cxcywh_to_xyxy(matched), cxcywh_to_xyxy(gt_boxes))
    l1_sum = jnp.sum(l1 * valid_f)
    giou_sum = jnp.sum((1.0 - giou) * valid_f)
    num_pos = jnp.sum(valid_f)
    return ce_sum, ce_weight_sum, l1_sum, giou_sum, num_pos


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


def deformable_detr_set_loss(
    logits: jnp.ndarray,      # [Q, C] sigmoid class logits (NO no-object col)
    pred_boxes: jnp.ndarray,  # [Q, 4] normalized (cx, cy, w, h) in [0, 1]
    gt_boxes: jnp.ndarray,    # [G, 4] normalized (cx, cy, w, h), padded
    gt_classes: jnp.ndarray,  # [G] int32 1..C (padding rows arbitrary)
    gt_valid: jnp.ndarray,    # [G] bool
    cost_class: float,
    cost_bbox: float,
    cost_giou: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """One image's Deformable-DETR set loss (Zhu et al., arXiv:2010.04159
    §4.4 + appendix A.4): Hungarian matching under the FOCAL-style class
    cost (the paper replaces DETR's softmax + no-object column with
    per-class sigmoids), then sigmoid focal loss over ALL (query, class)
    elements — matched queries target their GT class one-hot, everything
    else zero — plus L1 + (1 − GIoU) on the matched pairs.

    Same static-shape contract as ``detr_set_loss``: padded GT rows are
    excluded from the matching (sentinel matches dropped by the scatter,
    masked out of the box terms); every unmatched query keeps the
    all-zero (background) focal target. Returns per-image
    SUMS (``focal_sum, l1_sum, giou_sum, num_pos``) for the paper's
    batch-level normalization (every term / total matched pairs)."""
    from tpudet.ops.boxes import (
        cxcywh_to_xyxy,
        elementwise_giou,
        pairwise_giou,
    )
    from tpudet.ops.hungarian import hungarian_masked

    num_queries, num_classes = logits.shape
    logits = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)

    # --- focal matching cost [G, Q] (appendix A.4: the cost of class c is
    # the positive focal term minus the negative one, so a confident right
    # class is strongly negative and a confident wrong one positive) -------
    eps = 1e-8
    pos_cost = alpha * jnp.power(1.0 - p, gamma) * (-jnp.log(p + eps))
    neg_cost = (
        (1.0 - alpha) * jnp.power(p, gamma) * (-jnp.log(1.0 - p + eps))
    )
    cls_col = jnp.clip(gt_classes - 1, 0, num_classes - 1)
    c_class = (pos_cost - neg_cost)[:, cls_col].T            # [G, Q]
    c_bbox = jnp.sum(
        jnp.abs(gt_boxes[:, None, :] - pred_boxes[None, :, :]), axis=-1
    )
    c_giou = -pairwise_giou(
        cxcywh_to_xyxy(gt_boxes), cxcywh_to_xyxy(pred_boxes)
    )
    cost = cost_class * c_class + cost_bbox * c_bbox + cost_giou * c_giou
    cost = jnp.where(gt_valid[:, None], cost, 0.0)
    # Valid rows only (sentinel Q for padding; scatter drops, gather
    # clamps + valid-masked box terms) — see detr_set_loss.
    match = hungarian_masked(jax.lax.stop_gradient(cost), gt_valid)

    # --- classification: sigmoid focal over every (query, class) ----------
    tgt_cls = jnp.zeros((num_queries,), jnp.int32).at[match].set(
        gt_classes, mode="drop"
    )
    onehot = (
        jax.nn.one_hot(tgt_cls - 1, num_classes, dtype=jnp.float32)
        * (tgt_cls > 0)[:, None]
    )
    bce = (
        jnp.maximum(logits, 0)
        - logits * onehot
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    p_t = p * onehot + (1.0 - p) * (1.0 - onehot)
    alpha_t = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    focal_sum = jnp.sum(alpha_t * jnp.power(1.0 - p_t, gamma) * bce)

    # --- box terms on the matched valid pairs -----------------------------
    matched = pred_boxes[match]                              # [G, 4]
    valid_f = gt_valid.astype(jnp.float32)
    l1 = jnp.sum(jnp.abs(matched - gt_boxes), axis=-1)
    giou = elementwise_giou(cxcywh_to_xyxy(matched), cxcywh_to_xyxy(gt_boxes))
    l1_sum = jnp.sum(l1 * valid_f)
    giou_sum = jnp.sum((1.0 - giou) * valid_f)
    num_pos = jnp.sum(valid_f)
    return focal_sum, l1_sum, giou_sum, num_pos
