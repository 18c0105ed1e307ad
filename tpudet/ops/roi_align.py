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


def fpn_assign_levels(
    boxes: jnp.ndarray,
    min_level: int = 2,
    max_level: int = 5,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    fit_window: int = 0,
) -> jnp.ndarray:
    """FPN-paper RoI level assignment (k = floor(k0 + log2(sqrt(area)/224)),
    clipped to [min_level, max_level]) — shared by every FPN pooling backend
    so they are comparable bit-for-bit.

    ``fit_window`` > 0 additionally guarantees the WINDOWED pooler's
    precondition: the RoI's larger side must span at most ``fit_window - 12``
    cells at its assigned level (2 cells of bilinear-neighbor slack each
    side + 7 for the 8-aligned x-origin the TPU DMA tiling requires), so
    extreme-aspect boxes (border slivers: e.g. 4x800 px, whose sqrt-area
    assignment is p2 but whose long side spans ~200 p2 cells) are bumped to
    the first level where they fit. Identical for every box of
    aspect ratio below ~(fit_window/28)^2; the level shift for slivers is a
    deliberate, documented protocol choice of this framework's FPN (the TF2
    reference has no FPN — SURVEY.md C24 is build-only)."""
    areas = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )
    k = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-8)
    )
    k = jnp.clip(k, min_level, max_level).astype(jnp.int32)
    if fit_window:
        if fit_window <= 12:
            # The windowed pooler's slack budget is 12 cells (bilinear
            # halo + origin alignment); a window at or below it makes the
            # divisor non-positive, the log2 NaN, and every level
            # assignment garbage. Fail here — the model-level canvas check
            # (FasterRCNN.__init__) does not cover direct ops-layer use.
            raise ValueError(
                f"fit_window={fit_window} must exceed the 12-cell window "
                "slack (use window >= 24)"
            )
        span = jnp.maximum(
            boxes[..., 2] - boxes[..., 0], boxes[..., 3] - boxes[..., 1]
        )
        need = jnp.ceil(
            jnp.log2(jnp.maximum(span, 1.0) / float(fit_window - 12))
        ).astype(jnp.int32)
        k = jnp.clip(jnp.maximum(k, need), min_level, max_level)
    return k


def _window_axis_params(vals2, sizes, s, r, offset, max_origin, align=1):
    """One axis of windowed RoI-Align, SCALAR part: per-RoI sample-line
    parameters + window origin. The weight rows are a pure function of the
    returned (start, scale) and ``sizes`` — built dense by
    :func:`_window_axis_weights` (XLA paths/tests) or per-RoI on the VPU by
    ``kernels.roi_align_window`` (which only ships these [N]-length scalars
    to the chip instead of [N, s, window] weight tensors).

    vals2 [N, 2]: (lo, hi) box coords in the RoI's own level's feature
    cells; sizes [N]: that level's extent along this axis; ``max_origin``
    the largest slice start keeping the window inside the padded tensor
    (the clamp must happen HERE, before any weights are built, so weights
    and slice share one origin). Sample m in [0, s*r) sits at
    ``start + (m//r + ((m%r)+0.5)/r) * scale``. Returns
    (start [N] f32, scale [N] f32, origin [N] int32)."""
    min_extent = 1e-6 if offset else 1.0
    start = vals2[:, 0] - offset
    extent = jnp.maximum(vals2[:, 1] - vals2[:, 0], min_extent)
    scale = extent / s
    # First (smallest) sample of the increasing grid: m = 0.
    grid0 = (jnp.asarray(0.5, vals2.dtype)) / r
    posc0 = jnp.clip(start + grid0 * scale, 0.0, sizes - 1.0)
    # The origin stays low enough that floor(pos_max) + 1 < origin + window
    # (span <= window - 2) and the slice stays in-bounds (see callers'
    # packing proofs).
    origin = jnp.clip(
        jnp.floor(posc0), 0.0,
        jnp.asarray(max_origin, posc0.dtype),  # scalar or per-RoI [N]
    )
    if align > 1:
        # The TPU DMA source slice needs align-divisible offsets on the
        # sublane (second-minor) dim; rounding down costs up to align-1
        # columns of the window (priced into the fit_window slack).
        origin = jnp.floor(origin / align) * align
    return start, scale, origin.astype(jnp.int32)


def _window_axis_weights(vals2, sizes, s, r, offset, window, max_origin,
                         align=1):
    """One axis of windowed RoI-Align: per-RoI window origin + folded
    window-local bin-weight rows (the dense materialization of
    :func:`_window_axis_params` — XLA windowed path and the oracle the
    Pallas in-kernel build is tested against).

    Returns (weights [N, s, window] f32, origin [N] int32) with every
    nonzero weight column inside [origin, origin + window) — guaranteed by
    the ``fit_window`` level assignment + the in-bounds proof in
    :func:`roi_align_window`."""
    n = vals2.shape[0]
    start, scale, origin = _window_axis_params(
        vals2, sizes, s, r, offset, max_origin, align=align
    )
    grid = (
        jnp.arange(s, dtype=vals2.dtype)[:, None]
        + (jnp.arange(r, dtype=vals2.dtype)[None, :] + 0.5) / r
    ).reshape(-1)  # [s*r], increasing
    pos = start[:, None] + grid[None, :] * scale[:, None]
    valid = (pos >= -1.0) & (pos <= sizes[:, None])
    posc = jnp.clip(pos, 0.0, sizes[:, None] - 1.0)
    idx = (origin.astype(vals2.dtype)[:, None]
           + jnp.arange(window, dtype=vals2.dtype)[None, :])
    w = jnp.maximum(1.0 - jnp.abs(posc[:, :, None] - idx[:, None, :]), 0.0)
    w = w * valid[:, :, None]
    w = w.reshape(n, s, r, window).mean(axis=2)
    return w, origin


def roi_align_window(
    features,
    strides,
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    window: int = 48,
) -> jnp.ndarray:
    """FPN RoI Align via per-RoI static windows — the pool-ONCE-per-RoI
    formulation (VERDICT r1 item 4).

    The masked-sum path pools every RoI against every level's FULL map: the
    first einsum contracts over H_l*W_l per RoI, so P2 dominates and ~3/4 of
    the FLOPs produce masked-out zeros (~41 ms/batch at b=32 COCO — the
    dominant coco_r101_fpn cost). But the FPN assignment bounds every RoI's
    span at its OWN level to < 28*sqrt(aspect) cells, so it is enough to
    slice one static [window, window, C] tile per RoI around its box from a
    packed pyramid and contract against the tile: ~20x fewer MXU FLOPs and
    HBM reads bounded by R * window^2 * C instead of R * sum(H_l * W_l).

    ``levels`` must come from :func:`fpn_assign_levels` with
    ``fit_window=window`` (0-based here: level index into ``features``) —
    that is the precondition that every nonzero bilinear weight lands inside
    the window. Values then equal the per-level masked-sum path with the
    same assignment to float tolerance (tested).

    Packing layout: levels concatenated along H with ``window`` zero rows
    after each level (a window starting on the last real row never reads
    the next level's data) and W zero-padded to max(max W_l, window); the
    zero padding is only ever multiplied by exactly-zero weights.
    """
    packed, wy, wx, oy, ox = window_pool_setup(
        features, strides, boxes, levels, output_size, sampling_ratio,
        aligned, window,
    )
    c = features[0].shape[-1]
    dtype = features[0].dtype

    tiles = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(packed, (y, x, 0), (window, window, c))
    )(oy, ox)  # [N, window, window, C]

    wy = wy.astype(dtype)
    wx = wx.astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    t1 = jnp.einsum("nsh,nhwc->nswc", wy, tiles, precision=prec)
    return jnp.einsum("ntw,nswc->nstc", wx, t1, precision=prec)


def window_pool_setup(
    features, strides, boxes, levels, output_size, sampling_ratio,
    aligned, window,
):
    """Shared geometry for the windowed poolers (XLA gather path above and
    the Pallas DMA kernel in tpudet.kernels.roi_align_window): packs the
    pyramid and computes per-RoI window-local weights + slice origins.

    Returns (packed [sum(H_l + window), w_pad, C], wy [N, s, window] f32,
    wx [N, s, window] f32, oy [N] int32, ox [N] int32)."""
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    # Packed width 8-aligned so (w_pad - window) stays a legal 8-aligned
    # x-origin (window itself must be a multiple of 8).
    if window % 8:
        raise ValueError(f"window must be a multiple of 8, got {window}")
    w_pad = -(-max(max(f.shape[1] for f in features), window) // 8) * 8

    parts, offs, acc = [], [], 0
    for f in features:
        offs.append(acc)
        parts.append(
            jnp.pad(f, ((0, window), (0, w_pad - f.shape[1]), (0, 0)))
        )
        acc += f.shape[0] + window
    packed = jnp.concatenate(parts, axis=0)  # [sum(H_l + window), w_pad, C]

    h_arr = jnp.asarray([f.shape[0] for f in features], boxes.dtype)
    w_arr = jnp.asarray([f.shape[1] for f in features], boxes.dtype)
    off_arr = jnp.asarray(offs, jnp.int32)
    stride_arr = jnp.asarray(strides, boxes.dtype)

    st = stride_arr[levels][:, None]
    fboxes = boxes / st
    # y never needs an origin clamp (each level carries `window` pad rows,
    # so origin <= H_l - 1 always leaves the slice inside the level's
    # extent); x clamps to the packed width. Coverage under the clamp:
    # nonzero columns end at floor(pos_max) + 1 <= W_l <= w_pad - 1 <
    # (w_pad - window) + window.
    wy, y0 = _window_axis_weights(
        fboxes[:, (1, 3)], h_arr[levels], s, r, offset, window,
        max_origin=packed.shape[0],
    )
    wx, x0 = _window_axis_weights(
        fboxes[:, (0, 2)], w_arr[levels], s, r, offset, window,
        max_origin=w_pad - window, align=8,
    )
    oy = off_arr[levels] + y0  # y window may run into the level's pad rows
    return packed, wy, wx, oy, x0


def roi_align_window_train(
    features,
    strides,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    window: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Training-path windowed FPN pooling: Pallas windowed FORWARD +
    masked-sum-transpose BACKWARD (custom VJP).

    The forward is the pool-once-per-RoI Pallas kernel (the inference
    default — ~5x cheaper than pooling every RoI against every level); the
    kernel has no VJP, so the backward transposes the per-level masked-sum
    einsum expression instead (``jax.linear_transpose`` — pooling is linear
    in the feature maps, and the two formulations agree to float tolerance
    under the same fit-bumped level assignment, so the feature cotangent is
    the exact adjoint of the value the forward computes up to that
    tolerance). Boxes get a zero cotangent: proposals reach pooling through
    ``stop_gradient`` (+ appended GT) in Faster R-CNN training, so no
    gradient flows through box coordinates on this path anyway.

    Residuals are just ``boxes``: the backward rebuilds the bilinear
    weights from geometry, so feature VALUES are never saved — pooling adds
    no activation memory beyond its own output.
    """
    features = tuple(features)
    strides_t = tuple(float(v) for v in strides)
    shapes = tuple(jax.ShapeDtypeStruct(f.shape, f.dtype) for f in features)
    s, r = output_size, sampling_ratio

    def levels_of(b):
        # 0-based index into ``features`` (p2..p5), fit-bumped exactly like
        # the model's masked-sum training path so values/grads correspond.
        return fpn_assign_levels(b, fit_window=window) - 2

    def dense(feats, b, lv):
        # The per-level masked sum this framework trains through when the
        # Pallas kernel is unavailable — the backward is its transpose.
        pooled = 0.0
        for i, (f, st) in enumerate(zip(feats, strides_t)):
            p = roi_align_mxu(f, b / st, s, r, aligned)
            pooled = pooled + p * (lv == i)[:, None, None, None]
        return pooled

    @jax.custom_vjp
    def pool(feats, b):
        from tpudet.kernels.roi_align_window import roi_align_window_pallas

        return roi_align_window_pallas(
            feats, strides_t, b, levels_of(b), s, r, aligned, window,
            interpret=interpret,
        )

    def pool_fwd(feats, b):
        return pool(feats, b), b

    def pool_bwd(b, g):
        lv = levels_of(b)
        transpose = jax.linear_transpose(
            lambda feats: dense(feats, b, lv), shapes
        )
        (d_feats,) = transpose(g.astype(shapes[0].dtype))
        return tuple(d_feats), jnp.zeros_like(b)

    pool.defvjp(pool_fwd, pool_bwd)
    return pool(features, boxes)


def roi_align_window_train_batched(
    features,
    strides,
    boxes: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    window: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched :func:`roi_align_window_train`: features ``[B, H_l, W_l, C]``
    per level, boxes ``[B, N, 4]`` → ``[B, N, s, s, C]``.

    Same custom-VJP structure — Pallas windowed FORWARD, masked-sum-
    transpose BACKWARD — but the forward is ONE ``pallas_call`` over all
    ``B*N`` RoIs (a vmap of the per-image custom VJP lowers its forward to
    a per-image ``while`` loop; the backward einsum transpose batches fine
    either way and stays a batched XLA program here via one
    ``linear_transpose`` of the vmapped dense formulation)."""
    features = tuple(features)
    strides_t = tuple(float(v) for v in strides)
    shapes = tuple(jax.ShapeDtypeStruct(f.shape, f.dtype) for f in features)
    s, r = output_size, sampling_ratio

    def levels_of(b):  # [B, N] 0-based, fit-bumped like the masked sum
        return jax.vmap(
            lambda bb: fpn_assign_levels(bb, fit_window=window) - 2
        )(b)

    def dense_batched(feats, b, lv):
        def one(fs, bb, lvv):
            pooled = 0.0
            for i, (f, st) in enumerate(zip(fs, strides_t)):
                p = roi_align_mxu(f, bb / st, s, r, aligned)
                pooled = pooled + p * (lvv == i)[:, None, None, None]
            return pooled

        return jax.vmap(one)(feats, b, lv)

    @jax.custom_vjp
    def pool(feats, b):
        from tpudet.kernels.roi_align_window import (
            roi_align_window_pallas_batched,
        )

        return roi_align_window_pallas_batched(
            feats, strides_t, b, levels_of(b), s, r, aligned, window,
            interpret=interpret,
        )

    def pool_fwd(feats, b):
        return pool(feats, b), b

    def pool_bwd(b, g):
        lv = levels_of(b)
        transpose = jax.linear_transpose(
            lambda feats: dense_batched(feats, b, lv), shapes
        )
        (d_feats,) = transpose(g.astype(shapes[0].dtype))
        return tuple(d_feats), jnp.zeros_like(b)

    pool.defvjp(pool_fwd, pool_bwd)
    return pool(features, boxes)


def window_pool_setup_nopack(
    features, strides, boxes, levels, output_size, sampling_ratio,
    aligned, window,
):
    """Windowed-pooler geometry WITHOUT the packed-pyramid copy (the v2
    contract of ``tpudet.kernels.roi_align_window``): the per-RoI tile is
    sliced from the RoI's own level map, so the only data movement outside
    the kernel is a tiny static pad of the levels that need one (P4's W to
    the next multiple of 8, P5 up to ``window`` per side on COCO canvases —
    ~5 MB/img vs the ~150 MB/img full re-pack this replaces, measured 3.9
    of 4.9 ms/img of the v1 path).

    Per-level in-bounds proof (mirrors :func:`roi_align_window`'s packed
    one). With H_pad = max(H_l, window) and W_pad = max(ceil8(W_l), window):

    * nonzero bilinear rows/cols lie in [0, size_l - 1] (samples are clipped
      to [0, size_l - 1], and a weight at index ``size_l`` would need a
      sample > size_l - 1);
    * the origin is clipped to [0, pad - window], so the slice stays inside
      the padded map, and at the clip boundary the window ends at pad - 1 >=
      size_l - 1, covering every nonzero index;
    * below the boundary the ``fit_window`` slack (span <= window - 12,
      minus up to 7 for the 8-aligned x origin) keeps
      floor(pos_max) + 1 < origin + window;
    * both pads and ``window`` are multiples of 8, so the clipped x origin
      stays 8-aligned after the align-floor.

    Returns (padded_features [list of [H_pad_l, W_pad_l, C]],
    wy [N, s, window] f32, wx [N, s, window] f32, oy [N] int32,
    ox [N] int32) with LEVEL-LOCAL origins."""
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    padded, geom = _nopack_geometry(features, strides, boxes, levels, window)
    fboxes, sizes_y, sizes_x, max_oy, max_ox = geom
    wy, oy = _window_axis_weights(
        fboxes[:, (1, 3)], sizes_y, s, r, offset, window, max_origin=max_oy,
    )
    wx, ox = _window_axis_weights(
        fboxes[:, (0, 2)], sizes_x, s, r, offset, window, max_origin=max_ox,
        align=8,
    )
    return padded, wy, wx, oy, ox


def _nopack_geometry(features, strides, boxes, levels, window):
    """Shared v2 (no-pack) windowed-pooler geometry: level pads + the
    per-RoI level-local box coords / axis extents / origin clamps."""
    if window % 8:
        raise ValueError(f"window must be a multiple of 8, got {window}")
    padded = []
    for f in features:
        hp = max(f.shape[0], window)
        wp = max(-(-f.shape[1] // 8) * 8, window)
        if (hp, wp) != f.shape[:2]:
            f = jnp.pad(
                f, ((0, hp - f.shape[0]), (0, wp - f.shape[1]), (0, 0))
            )
        padded.append(f)

    h_arr = jnp.asarray([f.shape[0] for f in features], boxes.dtype)
    w_arr = jnp.asarray([f.shape[1] for f in features], boxes.dtype)
    max_oy = jnp.asarray(
        [p.shape[0] - window for p in padded], boxes.dtype
    )
    max_ox = jnp.asarray(
        [p.shape[1] - window for p in padded], boxes.dtype
    )
    stride_arr = jnp.asarray(strides, boxes.dtype)

    st = stride_arr[levels][:, None]
    fboxes = boxes / st
    return padded, (
        fboxes, h_arr[levels], w_arr[levels], max_oy[levels], max_ox[levels]
    )


def window_pool_params_nopack(
    features, strides, boxes, levels, output_size, sampling_ratio,
    aligned, window,
):
    """Scalar-only setup for the Pallas windowed pooler: identical geometry
    to :func:`window_pool_setup_nopack` (same ``_window_axis_params`` origin
    math, so the in-bounds proof carries over verbatim) but ships only the
    per-RoI sample-line scalars — the kernel rebuilds each RoI's [s, window]
    weight rows on the VPU, so the [N, s, window] weight tensors (and their
    [N, s*r, window] build intermediates) never exist in HBM.

    Returns (padded_features, params [N, 6] f32
    (start_y, scale_y, size_y, start_x, scale_x, size_x),
    oy [N] int32, ox [N] int32) with LEVEL-LOCAL origins."""
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    padded, geom = _nopack_geometry(features, strides, boxes, levels, window)
    fboxes, sizes_y, sizes_x, max_oy, max_ox = geom
    start_y, scale_y, oy = _window_axis_params(
        fboxes[:, (1, 3)], sizes_y, s, r, offset, max_origin=max_oy,
    )
    start_x, scale_x, ox = _window_axis_params(
        fboxes[:, (0, 2)], sizes_x, s, r, offset, max_origin=max_ox, align=8,
    )
    params = jnp.stack(
        [start_y, scale_y, sizes_y, start_x, scale_x, sizes_x], axis=-1
    ).astype(jnp.float32)
    return padded, params, oy, ox


def window_pool_params_nopack_batched(
    features, strides, boxes, levels, output_size, sampling_ratio,
    aligned, window,
):
    """Batch-flattened :func:`window_pool_params_nopack`: features
    ``[B, H_l, W_l, C]`` per level, boxes ``[B, N, 4]``, levels ``[B, N]``.
    Every per-RoI quantity is elementwise in the RoI, so the batch axis
    flattens into the RoI axis and the single-image ``_window_axis_params``
    math (and its in-bounds proof) applies verbatim; only the feature pads
    move to dims 1–2. Feeds the batched Pallas kernel, whose grid covers
    all ``B*N`` RoIs in ONE call — a vmap of the single-image kernel would
    lower to a per-image ``while`` loop (measured 2.2 ms/step of loop
    scaffolding + a pipeline drain per image at b=32 COCO).

    Returns (padded batched features, params ``[B*N, 6]`` f32,
    oy ``[B*N]`` int32, ox ``[B*N]`` int32)."""
    if window % 8:
        raise ValueError(f"window must be a multiple of 8, got {window}")
    s, r = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    padded = []
    for f in features:
        hp = max(f.shape[1], window)
        wp = max(-(-f.shape[2] // 8) * 8, window)
        if (hp, wp) != f.shape[1:3]:
            f = jnp.pad(
                f,
                ((0, 0), (0, hp - f.shape[1]), (0, wp - f.shape[2]), (0, 0)),
            )
        padded.append(f)
    b, n = boxes.shape[:2]
    flat_boxes = boxes.reshape(b * n, 4)
    flat_levels = levels.reshape(b * n)
    h_arr = jnp.asarray([f.shape[1] for f in features], boxes.dtype)
    w_arr = jnp.asarray([f.shape[2] for f in features], boxes.dtype)
    max_oy = jnp.asarray([p.shape[1] - window for p in padded], boxes.dtype)
    max_ox = jnp.asarray([p.shape[2] - window for p in padded], boxes.dtype)
    st = jnp.asarray(strides, boxes.dtype)[flat_levels][:, None]
    fboxes = flat_boxes / st
    sizes_y = h_arr[flat_levels]
    sizes_x = w_arr[flat_levels]
    start_y, scale_y, oy = _window_axis_params(
        fboxes[:, (1, 3)], sizes_y, s, r, offset,
        max_origin=max_oy[flat_levels],
    )
    start_x, scale_x, ox = _window_axis_params(
        fboxes[:, (0, 2)], sizes_x, s, r, offset,
        max_origin=max_ox[flat_levels], align=8,
    )
    params = jnp.stack(
        [start_y, scale_y, sizes_y, start_x, scale_x, sizes_x], axis=-1
    ).astype(jnp.float32)
    return padded, params, oy, ox
