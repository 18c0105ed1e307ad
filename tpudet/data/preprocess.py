"""Image preprocessing (SURVEY.md C2–C4).

Host half (NumPy/PIL, runs in loader threads): decode → aspect-preserving
resize so min side = ``min_size`` without the max side exceeding ``max_size``
(Fast R-CNN §2.2 canonical 600/1000) → pad onto the static canvas (top-left) →
scale boxes by the same factor. Output stays uint8 to keep the host→device
transfer 4x smaller than float32.

Device half (jnp, fused into the jitted train/eval step): uint8→float32,
per-channel mean/std normalize (C3), and — training only — per-image random
horizontal flip of the *valid region* with matching box flip (the only
augmentation in Faster R-CNN, §3.1.3)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpudet.config import Config, DataConfig
from tpudet.ops.boxes import flip_boxes_horizontal

_warned_gt_truncation = False


def resize_scale(h: int, w: int, min_size: int, max_size: int) -> float:
    """Aspect-preserving scale: min side -> min_size, capped by max_size."""
    scale = min_size / min(h, w)
    if scale * max(h, w) > max_size:
        scale = max_size / max(h, w)
    return scale


def jittered_minmax(
    cfg: DataConfig, h: int, w: int, ch: int, cw: int, factor: float
) -> Tuple[int, int]:
    """Integer (min_size, max_size) implementing per-image scale jitter
    (data.scale_jitter): the protocol sizes scaled by ``factor``, clamped so
    the resized image is guaranteed to fit the (ch, cw) canvas chosen from
    the UNJITTERED size — the bucket/canvas plan never sees the jitter, so
    static shapes and the cross-process plan are unaffected.

    Expressed as integer sizes (not a float scale) because both decode
    front-ends — PIL here and the native C++ fused path — take integer
    protocol sizes; identical inputs keep the two paths identical.
    Fit proof: resize_scale yields either jmin/min_side or jmax/max_side;
    with jmin <= s_fit*min_side and jmax <= s_fit*max_side both are
    <= s_fit = min(ch/h, cw/w), so round(h*s) <= ch and round(w*s) <= cw."""
    s_fit = min(ch / h, cw / w)
    jmin = min(round(cfg.min_size * factor), int(s_fit * min(h, w)))
    jmax = min(round(cfg.max_size * factor), int(s_fit * max(h, w)))
    return max(1, jmin), max(1, jmax)


def bucket_for_hw(cfg: DataConfig, h: int, w: int) -> int:
    """Bucket id for an image of original size (h, w).

    With ``aspect_buckets`` the image goes to the canvas that fits its
    resized shape with the fewest padded pixels (buckets too small on either
    axis are penalized by the clipped area and only win when nothing fits);
    with ``orientation_buckets`` landscape -> 0, portrait -> 1; otherwise
    everything is bucket 0. The loader groups batches by this id."""
    if cfg.aspect_buckets:
        scale = resize_scale(h, w, cfg.min_size, cfg.max_size)
        th, tw = round(h * scale), round(w * scale)
        best, best_cost = 0, None
        for i, (ch, cw) in enumerate(cfg.aspect_buckets):
            fit_h, fit_w = min(th, ch), min(tw, cw)
            clipped = th * tw - fit_h * fit_w
            cost = (ch * cw - fit_h * fit_w) + 4 * clipped
            if best_cost is None or cost < best_cost:
                best, best_cost = i, cost
        return best
    if cfg.orientation_buckets:
        return 0 if w >= h else 1
    return 0


def canvas_for_hw(cfg: DataConfig, h: int, w: int) -> Tuple[int, int]:
    """Static canvas (ch, cw) for an image of original size (h, w)."""
    if cfg.aspect_buckets:
        return tuple(cfg.aspect_buckets[bucket_for_hw(cfg, h, w)])
    if not cfg.orientation_buckets:
        return cfg.canvas_height, cfg.canvas_width
    if w >= h:
        return cfg.canvas_short, cfg.canvas_width
    return cfg.canvas_height, cfg.canvas_short


def _finalize_example(
    cfg: DataConfig,
    canvas: np.ndarray,
    nh: int,
    nw: int,
    h: int,
    w: int,
    boxes: np.ndarray,
    classes: np.ndarray,
    difficult: np.ndarray | None,
    crowd: np.ndarray | None = None,
    area: np.ndarray | None = None,
    masks=None,
    keypoints=None,
    semantic=None,
) -> Dict[str, np.ndarray]:
    """Shared tail of the host front-end: pack GT to fixed shapes + scale
    boxes by the exact per-axis resize factors (rounding differs per axis).

    ``keypoints`` (only consulted when ``cfg.load_keypoints``) is [n, K, 3]
    (x, y, v) in ORIGINAL-image coordinates (COCO convention: v 0 unlabeled,
    1 labeled-invisible, 2 visible); x/y scale with the boxes, v rides
    through.

    ``area`` is the annotation's own area field in ORIGINAL-image pixels
    (COCO's segmentation area — usually smaller than the box area for
    thin/diagonal objects); the COCO evaluator bins GT by it, exactly as
    pycocotools does. -1 marks "no annotation area" (VOC) and the evaluator
    falls back to box area.

    ``masks`` (only consulted when ``cfg.load_masks``) is a per-instance
    list of mask reps in ORIGINAL-image coordinates (full ndarray / COCO
    polygons / RLE dict / None — see ``tpudet.data.masks``); each is
    rasterized into its ORIGINAL box's frame at ``cfg.gt_mask_size`` — the
    crop is box-frame normalized, so the resize-to-canvas never touches it."""
    g = cfg.max_gt_boxes
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_classes = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_difficult = np.zeros((g,), bool)
    gt_crowd = np.zeros((g,), bool)
    gt_area = np.full((g,), -1.0, np.float32)
    n = min(len(boxes), g)
    if len(boxes) > g:
        global _warned_gt_truncation
        if not _warned_gt_truncation:
            _warned_gt_truncation = True
            print(
                f"preprocess: an image has {len(boxes)} GT boxes; keeping "
                f"the first {g} (raise data.max_gt_boxes to keep all — "
                "dropped GT are invisible to training AND eval npos). "
                "Further truncations will not be logged."
            )
    if difficult is not None and n:
        gt_difficult[:n] = difficult[:n]
    if crowd is not None and n:
        gt_crowd[:n] = crowd[:n]
    if area is not None and n:
        gt_area[:n] = area[:n]
    if n:
        scaled = np.stack(
            [
                boxes[:n, 0] * (nw / w),
                boxes[:n, 1] * (nh / h),
                boxes[:n, 2] * (nw / w),
                boxes[:n, 3] * (nh / h),
            ],
            axis=-1,
        ).astype(np.float32)
        gt_boxes[:n] = scaled
        gt_classes[:n] = classes[:n]
        gt_valid[:n] = True

    if getattr(cfg, "load_semantic", False):
        # Semantic map at the branch's 1/4-scale loss resolution: each
        # quarter-res cell samples the ORIGINAL map nearest to its canvas
        # center; padded cells carry the void/ignore label 0.
        ch, cw = canvas.shape[:2]
        s4h, s4w = -(-ch // 4), -(-cw // 4)
        gt_semantic = np.zeros((s4h, s4w), np.int32)
        if semantic is not None:
            sem = np.asarray(semantic)
            cyc = np.arange(s4h) * 4.0 + 1.5  # canvas-y of each cell center
            cxc = np.arange(s4w) * 4.0 + 1.5
            vy = cyc < nh
            vx = cxc < nw
            oy = np.clip((cyc * (h / nh)).astype(np.int64), 0, h - 1)
            ox = np.clip((cxc * (w / nw)).astype(np.int64), 0, w - 1)
            sampled = sem[oy[:, None], ox[None, :]].astype(np.int32)
            gt_semantic = np.where(
                vy[:, None] & vx[None, :], sampled, 0
            ).astype(np.int32)
        out_semantic = gt_semantic
    else:
        out_semantic = None

    if getattr(cfg, "load_keypoints", False):
        kk = cfg.num_keypoints
        gt_keypoints = np.zeros((g, kk, 3), np.float32)
        if keypoints is not None:
            # Per-instance [K, 3] arrays (or None for unannotated instances
            # — COCO non-person categories); v stays 0 there.
            for i in range(n):
                ki = keypoints[i]
                if ki is None:
                    continue
                ki = np.asarray(ki, np.float32)
                if ki.shape != (kk, 3):
                    raise ValueError(
                        f"instance keypoints shaped {ki.shape} but "
                        f"data.num_keypoints = {kk} (want [{kk}, 3])"
                    )
                gt_keypoints[i, :, 0] = ki[:, 0] * (nw / w)
                gt_keypoints[i, :, 1] = ki[:, 1] * (nh / h)
                gt_keypoints[i, :, 2] = ki[:, 2]
        out_keypoints = gt_keypoints
    else:
        out_keypoints = None

    if getattr(cfg, "load_masks", False):
        from tpudet.data.masks import crop_instances

        m = cfg.gt_mask_size
        gt_masks = np.zeros((g, m, m), np.uint8)
        if n:
            # Crops are rasterized against the ORIGINAL-coordinate boxes:
            # box-frame normalization makes them resize-invariant.
            gt_masks[:n] = crop_instances(
                None if masks is None else masks[:n], boxes[:n], m
            )
        out_masks = gt_masks
    else:
        out_masks = None

    return {
        "image": canvas,
        "image_hw": np.asarray([nh, nw], np.float32),
        "image_scale": np.asarray([nh / h, nw / w], np.float32),
        "orig_hw": np.asarray([h, w], np.float32),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
        "gt_difficult": gt_difficult,
        "gt_crowd": gt_crowd,
        "gt_area": gt_area,
        **({"gt_masks": out_masks} if out_masks is not None else {}),
        **({"gt_keypoints": out_keypoints}
           if out_keypoints is not None else {}),
        **({"gt_semantic": out_semantic}
           if out_semantic is not None else {}),
    }


def prepare_example(
    cfg: DataConfig,
    image: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    difficult: np.ndarray | None = None,
    crowd: np.ndarray | None = None,
    area: np.ndarray | None = None,
    masks=None,
    keypoints=None,
    semantic=None,
    scale_factor: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Host-side C2+C4 for one example -> fixed-shape arrays.

    image: [h, w, 3] uint8; boxes [n, 4] float (x1,y1,x2,y2); classes [n] 1..C.
    ``scale_factor``: train-time multi-scale jitter (see jittered_minmax).
    """
    from PIL import Image

    h, w = image.shape[:2]
    ch, cw = canvas_for_hw(cfg, h, w)
    if scale_factor == 1.0:
        min_size, max_size = cfg.min_size, cfg.max_size
    else:
        min_size, max_size = jittered_minmax(cfg, h, w, ch, cw, scale_factor)
    scale = resize_scale(h, w, min_size, max_size)
    nh, nw = min(ch, round(h * scale)), min(cw, round(w * scale))
    if (nh, nw) != (h, w):
        image = np.asarray(
            Image.fromarray(image).resize((nw, nh), Image.BILINEAR)
        )
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[:nh, :nw] = image
    return _finalize_example(
        cfg, canvas, nh, nw, h, w, boxes, classes, difficult, crowd, area,
        masks=masks, keypoints=keypoints, semantic=semantic,
    )


def prepare_example_jpeg(
    cfg: DataConfig,
    jpeg: bytes,
    boxes: np.ndarray,
    classes: np.ndarray,
    difficult: np.ndarray | None = None,
    crowd: np.ndarray | None = None,
    area: np.ndarray | None = None,
    masks=None,
    keypoints=None,
    semantic=None,
    scale_factor: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Native-decoder variant of ``prepare_example``: the C++ front-end fuses
    JPEG decode (DCT-scaled when ``fast_jpeg_scale``), resize, and canvas pad
    in one pass (tpudet/native/decoder.cpp). Identical output contract —
    including ``scale_factor``, which both paths express through the same
    jittered integer protocol sizes (jittered_minmax)."""
    from tpudet.data import native_decode

    h = w = None
    if cfg.orientation_buckets or cfg.aspect_buckets:
        h, w = native_decode.jpeg_dims(jpeg)
        ch, cw = canvas_for_hw(cfg, h, w)
    else:
        ch, cw = cfg.canvas_height, cfg.canvas_width
    min_size, max_size = cfg.min_size, cfg.max_size
    if scale_factor != 1.0:
        if h is None:
            h, w = native_decode.jpeg_dims(jpeg)  # cheap header parse
        min_size, max_size = jittered_minmax(cfg, h, w, ch, cw, scale_factor)
    canvas, (nh, nw), (h, w) = native_decode.decode_resize_pad(
        jpeg, min_size, max_size, ch, cw,
        fast_dct_scale=cfg.fast_jpeg_scale,
    )
    return _finalize_example(
        cfg, canvas, nh, nw, h, w, boxes, classes, difficult, crowd, area,
        masks=masks, keypoints=keypoints, semantic=semantic,
    )


def rescale_to_original(boxes: np.ndarray, image_scale: np.ndarray,
                        orig_hw: np.ndarray) -> np.ndarray:
    """Canvas coords -> original-image coords: the exact inverse of the
    per-axis resize in ``_finalize_example`` (shared by eval, detect, and
    serving so the contract lives in one place)."""
    sy, sx = image_scale[0], image_scale[1]
    out = boxes.copy()
    out[:, [0, 2]] /= sx
    out[:, [1, 3]] /= sy
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, orig_hw[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, orig_hw[0])
    return out


def rescale_keypoints_to_original(kps: np.ndarray, image_scale: np.ndarray,
                                  orig_hw: np.ndarray) -> np.ndarray:
    """Canvas-coordinate keypoints [..., 3] (x, y, v/score) -> original-image
    coordinates: the keypoint counterpart of ``rescale_to_original``."""
    sy, sx = image_scale[0], image_scale[1]
    out = kps.copy()
    out[..., 0] = (out[..., 0] / sx).clip(0, orig_hw[1])
    out[..., 1] = (out[..., 1] / sy).clip(0, orig_hw[0])
    return out


def _color_jitter_single(image, image_hw, rng, jitter):
    """Photometric augmentation of ONE image's valid region (jit-safe,
    [H, W, 3] float 0..255): brightness/contrast/saturation by U(1-x, 1+x)
    factors, hue by a U(-h, h)-turn rotation in YIQ space (a single 3x3
    pixel matmul — the device-friendly equivalent of an HSV hue shift; YIQ's
    I/Q plane is the chroma plane, so rotating it shifts hue while leaving
    luma Y exact). The grayscale means use the valid region only and the
    padding is re-zeroed, so padded pixels never leak into (or out of) the
    statistics."""
    b, c, s, h = jitter
    kb, kc, ks, kh = jax.random.split(rng, 4)
    rows = jnp.arange(image.shape[0])[:, None] < image_hw[0]
    cols = jnp.arange(image.shape[1])[None, :] < image_hw[1]
    valid = (rows & cols)[:, :, None].astype(image.dtype)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)

    out = image
    if b > 0:
        out = out * jax.random.uniform(kb, (), minval=1 - b, maxval=1 + b)
    # ITU-R 601 luma — the torchvision grayscale convention.
    luma_w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
    if c > 0:
        gray_mean = jnp.sum(
            (out @ luma_w)[:, :, None] * valid
        ) / n_valid
        f = jax.random.uniform(kc, (), minval=1 - c, maxval=1 + c)
        out = (out - gray_mean) * f + gray_mean
    if s > 0:
        gray = (out @ luma_w)[:, :, None]
        f = jax.random.uniform(ks, (), minval=1 - s, maxval=1 + s)
        out = gray + (out - gray) * f
    if h > 0:
        theta = jax.random.uniform(
            kh, (), minval=-h, maxval=h
        ) * (2.0 * jnp.pi)
        # RGB -> YIQ, rotate the IQ chroma plane, YIQ -> RGB, folded into
        # ONE 3x3 matrix at trace time modulo the theta-dependent rotation.
        rgb2yiq = jnp.asarray(
            [[0.299, 0.587, 0.114],
             [0.5959, -0.2746, -0.3213],
             [0.2115, -0.5227, 0.3112]], image.dtype)
        yiq2rgb = jnp.asarray(
            [[1.0, 0.956, 0.619],
             [1.0, -0.272, -0.647],
             [1.0, -1.106, 1.703]], image.dtype)
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        one = jnp.ones((), image.dtype)
        zero = jnp.zeros((), image.dtype)
        rot = jnp.stack([
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, cos_t, -sin_t]),
            jnp.stack([zero, sin_t, cos_t]),
        ])
        m = yiq2rgb @ rot @ rgb2yiq
        out = out @ m.T
    out = jnp.clip(out, 0.0, 255.0) * valid
    return out


def _flip_single(image, boxes, image_hw):
    """Horizontally mirror the valid region [0:h, 0:w] of a padded canvas."""
    w_img = image_hw[1]
    cols = jnp.arange(image.shape[1])
    src = jnp.where(cols < w_img, w_img - 1 - cols, cols).astype(jnp.int32)
    flipped = image[:, src, :]
    return flipped, flip_boxes_horizontal(boxes, w_img)


def device_preprocess(
    cfg: Config,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array | None = None,
    training: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Device-side C3: normalize (+ random flip in training). jit-safe."""
    d = cfg.data
    image = batch["image"].astype(jnp.float32)
    mean = jnp.asarray(d.pixel_mean, jnp.float32)
    std = jnp.asarray(d.pixel_std, jnp.float32)

    gt_boxes = batch.get("gt_boxes")
    if (training and rng is not None
            and tuple(getattr(d, "color_jitter", ())) not in ((), (0.0,) * 4)):
        rng, color_rng = jax.random.split(rng)
        bsz = image.shape[0]
        image = jax.vmap(
            lambda img, hw, k: _color_jitter_single(
                img, hw, k, d.color_jitter
            )
        )(image, batch["image_hw"], jax.random.split(color_rng, bsz))
    if training and d.random_flip and rng is not None and gt_boxes is not None:
        b = image.shape[0]
        do_flip = jax.random.bernoulli(rng, 0.5, (b,))
        f_img, f_boxes = jax.vmap(_flip_single)(
            image, gt_boxes, batch["image_hw"]
        )
        image = jnp.where(do_flip[:, None, None, None], f_img, image)
        gt_boxes = jnp.where(do_flip[:, None, None], f_boxes, gt_boxes)
        if "gt_masks" in batch:
            # Box-frame crops are resize-invariant but NOT flip-invariant:
            # mirroring the image mirrors each instance within its own
            # (mirrored) box, so the crop flips left-right.
            gm = batch["gt_masks"]
            out_masks = jnp.where(
                do_flip[:, None, None, None], gm[:, :, :, ::-1], gm
            )
        else:
            out_masks = None
        if "gt_semantic" in batch:
            # Quarter-resolution class map: mirror the valid cells (those
            # whose canvas-center 4x + 1.5 lies inside the image width).
            gs = batch["gt_semantic"]  # [B, H4, W4] int32

            def _flip_sem(sem, hw):
                w4 = jnp.ceil((hw[1] - 1.5) / 4.0).astype(jnp.int32)
                cols = jnp.arange(sem.shape[1])
                src = jnp.where(cols < w4, w4 - 1 - cols, cols).astype(
                    jnp.int32
                )
                return sem[:, src]

            f_sem = jax.vmap(_flip_sem)(gs, batch["image_hw"])
            out_semantic = jnp.where(do_flip[:, None, None], f_sem, gs)
        else:
            out_semantic = None
        if "gt_keypoints" in batch:
            # Mirror x (same convention as the box flip) and swap the
            # left/right keypoint pairs; v == 0 rows keep their zero coords.
            gk = batch["gt_keypoints"]  # [B, G, K, 3]
            w_img = batch["image_hw"][:, 1][:, None, None]
            labeled = gk[..., 2] > 0
            fx = jnp.where(labeled, w_img - gk[..., 0], gk[..., 0])
            flipped = jnp.stack([fx, gk[..., 1], gk[..., 2]], axis=-1)
            pairs = tuple(getattr(d, "keypoint_flip_pairs", ()))
            if pairs:
                perm = np.arange(gk.shape[2])
                for a_i, b_i in pairs:
                    perm[a_i], perm[b_i] = perm[b_i], perm[a_i]
                flipped = flipped[:, :, perm, :]
            out_keypoints = jnp.where(
                do_flip[:, None, None, None], flipped, gk
            )
        else:
            out_keypoints = None
    else:
        out_masks = None
        out_keypoints = None
        out_semantic = None

    out = dict(batch)
    if out_masks is not None:
        out["gt_masks"] = out_masks
    if out_keypoints is not None:
        out["gt_keypoints"] = out_keypoints
    if out_semantic is not None:
        out["gt_semantic"] = out_semantic
    normalized = (image - mean) / std
    # Emit the image directly in the backbone's compute dtype: the backbone
    # casts on entry anyway, and writing/re-reading the [B, H, W, 3] canvas
    # in f32 doubles the HBM traffic of the normalize for no precision gain
    # (the normalize itself still runs in f32).
    if cfg.backbone.dtype == "bfloat16":
        normalized = normalized.astype(jnp.bfloat16)
    out["image"] = normalized
    if gt_boxes is not None:
        out["gt_boxes"] = gt_boxes
    return out
