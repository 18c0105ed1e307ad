"""RoI feature extraction, jnp reference path (SURVEY.md C12).

Two flavors, selected by ``ROIConfig.pooler``:

  * :func:`crop_and_resize` — exact semantics of ``tf.image.crop_and_resize``
    (what the TF2 reference uses; the float-tolerance parity oracle): a
    ``crop × crop`` bilinear sample grid spanning the box corners inclusive,
    with box coordinates interpreted against pixel *indices* (normalization by
    ``dim - 1``), zero extrapolation outside the image.
  * :func:`roi_align` — canonical RoI Align (Mask R-CNN): ``sampling_ratio²``
    bilinear samples averaged per output bin, half-pixel-center convention
    (``aligned=True``), clamped sampling near borders.

Both take boxes in **feature-map coordinates** ``[x1, y1, x2, y2]`` (callers
divide image-space boxes by the stride) and operate on one image; callers
``jax.vmap`` over the batch. Gather-based bilinear; static shapes throughout.
The Pallas fast path lives in ``tpudet.kernels.roi_align``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(features: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample [H, W, C] at (clamped) float coords ys/xs [...].

    Coordinates are in index space (pixel i sits at coordinate i). Inputs are
    assumed already clipped to [0, H-1] / [0, W-1]; returns [..., C].
    """
    h, w = features.shape[0], features.shape[1]
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, h - 1)
    x0 = jnp.clip(x0, 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (ys - y0.astype(ys.dtype))[..., None]
    lx = (xs - x0.astype(xs.dtype))[..., None]

    v00 = features[y0, x0]
    v01 = features[y0, x1]
    v10 = features[y1, x0]
    v11 = features[y1, x1]
    top = v00 * (1.0 - lx) + v01 * lx
    bot = v10 * (1.0 - lx) + v11 * lx
    return top * (1.0 - ly) + bot * ly


def crop_and_resize(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    crop_size: int,
    extrapolation_value: float = 0.0,
) -> jnp.ndarray:
    """TF-convention crop and resize: [H, W, C], [N, 4] -> [N, S, S, C]."""
    h, w = features.shape[0], features.shape[1]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    s = crop_size

    # Sample grid spans corners inclusive: crop_size points from c1 to c2.
    if s > 1:
        steps = jnp.arange(s, dtype=boxes.dtype) / (s - 1)  # [S] in [0, 1]
        ys = y1[:, None] + steps[None, :] * (y2 - y1)[:, None]  # [N, S]
        xs = x1[:, None] + steps[None, :] * (x2 - x1)[:, None]
    else:
        ys = (0.5 * (y1 + y2))[:, None]
        xs = (0.5 * (x1 + x2))[:, None]

    valid_y = (ys >= 0) & (ys <= h - 1)  # [N, S]
    valid_x = (xs >= 0) & (xs <= w - 1)
    ys_c = jnp.clip(ys, 0, h - 1)
    xs_c = jnp.clip(xs, 0, w - 1)

    yy = jnp.broadcast_to(ys_c[:, :, None], (boxes.shape[0], s, s))
    xx = jnp.broadcast_to(xs_c[:, None, :], (boxes.shape[0], s, s))
    out = _bilinear(features, yy, xx)  # [N, S, S, C]

    valid = (valid_y[:, :, None] & valid_x[:, None, :])[..., None]
    return jnp.where(valid, out, extrapolation_value)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """RoI Align: [H, W, C], [N, 4] -> [N, out, out, C].

    ``sampling_ratio`` bilinear samples per bin side, averaged. With
    ``aligned=True`` coordinates are shifted by -0.5 so that pixel centers sit
    at half-integer positions (the Detectron2 convention).
    """
    h, w = features.shape[0], features.shape[1]
    n = boxes.shape[0]
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0

    x1 = boxes[:, 0] - offset
    y1 = boxes[:, 1] - offset
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6 if aligned else 1.0)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6 if aligned else 1.0)

    bin_w = bw / s
    bin_h = bh / s
    # Sample position (i, u): y1 + (i + (u + 0.5)/r) * bin_h, i in [0, s),
    # u in [0, r). Flattened to S*R sample rows/cols per box.
    grid = (
        jnp.arange(s, dtype=boxes.dtype)[:, None]
        + (jnp.arange(r, dtype=boxes.dtype)[None, :] + 0.5) / r
    ).reshape(-1)  # [S*R]
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # [N, S*R]
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]

    # Border handling (Detectron2): samples outside [-1, dim] contribute 0,
    # in-range samples are clamped to [0, dim-1].
    vy = (ys >= -1.0) & (ys <= h)
    vx = (xs >= -1.0) & (xs <= w)
    ys_c = jnp.clip(ys, 0, h - 1)
    xs_c = jnp.clip(xs, 0, w - 1)

    yy = jnp.broadcast_to(ys_c[:, :, None], (n, s * r, s * r))
    xx = jnp.broadcast_to(xs_c[:, None, :], (n, s * r, s * r))
    sampled = _bilinear(features, yy, xx)  # [N, S*R, S*R, C]
    vmask = (vy[:, :, None] & vx[:, None, :])[..., None]
    sampled = jnp.where(vmask, sampled, 0.0)

    # Average the r x r samples inside each bin.
    c = features.shape[-1]
    sampled = sampled.reshape(n, s, r, s, r, c)
    return jnp.mean(sampled, axis=(2, 4))


def _sample_grid(boxes, size, s, r, offset):
    """Sample coords along one axis: [N, s*r] positions + validity mask.

    The degenerate-extent clamp matches :func:`roi_align`: 1e-6 when aligned
    (offset 0.5), 1.0 in legacy unaligned mode (tf/detectron convention).
    """
    min_extent = 1e-6 if offset else 1.0
    start = boxes[:, 0] - offset
    extent = jnp.maximum(boxes[:, 1] - boxes[:, 0], min_extent)
    grid = (
        jnp.arange(s, dtype=boxes.dtype)[:, None]
        + (jnp.arange(r, dtype=boxes.dtype)[None, :] + 0.5) / r
    ).reshape(-1)
    pos = start[:, None] + grid[None, :] * (extent / s)[:, None]
    valid = (pos >= -1.0) & (pos <= size)
    return jnp.clip(pos, 0, size - 1), valid


def _interp_weights(pos, valid, size):
    """[N, S] clamped positions -> [N, S, size] bilinear weight rows.

    Each row has the two standard bilinear weights (w = 1 - distance to the
    neighboring integer coordinates); out-of-range samples are zeroed. This
    is exactly the separable factorization of 2D bilinear interpolation.
    """
    idx = jnp.arange(size, dtype=pos.dtype)
    w = jnp.maximum(1.0 - jnp.abs(pos[:, :, None] - idx[None, None, :]), 0.0)
    return w * valid[:, :, None]


def roi_align_mxu(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """RoI Align as two MXU contractions (TPU-native formulation).

    Bilinear sampling is separable: pooled[n,i,j,c] = Σ_y Σ_x Wy[n,i,y] ·
    Wx[n,j,x] · F[y,x,c], where Wy/Wx are per-axis interpolation weight
    rows. Instead of 4-corner gathers (scatter/gather is the TPU's weakest
    memory op) this runs as two dense einsums that XLA maps straight onto
    the systolic array. Numerically identical to :func:`roi_align` up to
    float summation order.

    The r×r in-bin sample average is FOLDED into the weight rows (average
    of bilinear weights = weights of the averaged samples — both linear):
    the contractions then produce [N, s, W, C] / [N, s, s, C] directly
    instead of [N, s·r, ...] sampled tensors plus a reduce. At b=32×300
    RoIs this removed ~21 ms/batch of HBM traffic (a 1.9 GB f32
    intermediate, its relayout copy, and the reduction) — the sampled
    formulation was 37% of inference device time.
    """
    h, w = features.shape[0], features.shape[1]
    n = boxes.shape[0]
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0

    ys, vy = _sample_grid(boxes[:, (1, 3)], h, s, r, offset)
    xs, vx = _sample_grid(boxes[:, (0, 2)], w, s, r, offset)
    # [N, s*r, size] sample weights -> [N, s, size] bin weights (f32 math,
    # cast to the feature dtype only after the average).
    wy = _interp_weights(ys, vy, h).reshape(n, s, r, h).mean(axis=2)
    wx = _interp_weights(xs, vx, w).reshape(n, s, r, w).mean(axis=2)

    dtype = features.dtype
    wy = wy.astype(dtype)
    wx = wx.astype(dtype)
    # f32 inputs get exact (HIGHEST) contractions: TPU's default matmul
    # precision truncates f32 operands to bf16 passes, which breaks the
    # float-tolerance parity this backend is used for in f32 eval mode
    # (measured 1.8e-2 max error vs 5e-7 at HIGHEST). bf16 inputs are the
    # MXU's native format, so the flag changes nothing on the fast path.
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    # Contract the LARGER spatial dim first so the [N, s, kept_dim, C]
    # intermediate keeps the smaller one: both orders are HBM-bound on that
    # intermediate (e.g. 2.2 GB vs 1.4 GB per b=32 batch on the 40x64 VOC
    # fmap — the shapes are static, so the choice costs nothing).
    if w >= h:
        t1 = jnp.einsum("ntw,hwc->nthc", wx, features, precision=prec)
        return jnp.einsum("nsh,nthc->nstc", wy, t1, precision=prec)
    t1 = jnp.einsum("nsh,hwc->nswc", wy, features, precision=prec)
    return jnp.einsum("ntw,nswc->nstc", wx, t1, precision=prec)


def _level_weights(boxes, size, s, r, offset):
    """One level's folded bin-weight rows: [N, s, size] (f32)."""
    n = boxes.shape[0]
    ys, vy = _sample_grid(boxes, size, s, r, offset)
    return _interp_weights(ys, vy, size).reshape(n, s, r, size).mean(axis=2)


def multi_level_roi_align_mxu(
    features,
    strides,
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """FPN RoI Align over a packed pyramid, as ONE MXU einsum pair.

    ``features`` is the list of per-level maps [H_l, W_l, C] (image coords =
    feature coords × ``strides[l]``), ``levels`` [N] the assigned level index
    per RoI. The naive static-shape formulation pools every RoI at every
    level and masked-sums (4 einsum pairs + 4x the [N, s, ·, C] HBM
    intermediates). Instead the levels are packed into one feature tensor —
    concatenated along H, W zero-padded to max(W_l) — and each RoI's
    interpolation weight rows are built against its assigned level's true
    (H_l, W_l) geometry, masked by assignment, and placed at the level's H
    offset. Off-level weights are hard zeros, so one contraction over the
    packed axes equals the assigned level's single-level RoI Align exactly
    (adding exact zeros), with ~2x less intermediate HBM traffic and 1/L the
    kernel dispatches. Values identical to per-level :func:`roi_align_mxu`
    (tested).
    """
    n = boxes.shape[0]
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    w_max = max(f.shape[1] for f in features)
    dtype = features[0].dtype

    wy_parts, wx = [], 0.0
    for lvl, (feat, stride) in enumerate(zip(features, strides)):
        h_l, w_l = feat.shape[0], feat.shape[1]
        fboxes = boxes / jnp.asarray(stride, boxes.dtype)
        m = (levels == lvl).astype(jnp.float32)[:, None, None]
        wy_parts.append(_level_weights(fboxes[:, (1, 3)], h_l, s, r, offset) * m)
        wx_l = _level_weights(fboxes[:, (0, 2)], w_l, s, r, offset) * m
        wx = wx + jnp.pad(wx_l, ((0, 0), (0, 0), (0, w_max - w_l)))
    wy = jnp.concatenate(wy_parts, axis=-1)  # [N, s, sum(H_l)]
    packed = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, w_max - f.shape[1]), (0, 0))) for f in features],
        axis=0,
    )  # [sum(H_l), w_max, C]

    wy = wy.astype(dtype)
    wx = wx.astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    h_tot = packed.shape[0]
    if w_max >= h_tot:
        t1 = jnp.einsum("ntw,hwc->nthc", wx, packed, precision=prec)
        return jnp.einsum("nsh,nthc->nstc", wy, t1, precision=prec)
    t1 = jnp.einsum("nsh,hwc->nswc", wy, packed, precision=prec)
    return jnp.einsum("ntw,nswc->nstc", wx, t1, precision=prec)
