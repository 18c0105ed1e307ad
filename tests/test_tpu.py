"""On-TPU test tier (VERDICT r1 item 3; SURVEY.md §4 items 3–4).

Run with::

    TPUDET_TEST_TPU=1 python -m pytest tests/test_tpu.py -m tpu -x -q

Interpret-mode Pallas tests (the default CPU tier) cannot see Mosaic compiler
or TPU-runtime behavior: the ragged 4507-candidate NMS call that crashed the
TPU worker during round-1 bring-up was green in every interpret test. This
tier re-runs the kernels compiled through Mosaic at real shapes, plus one
full predict and one train step on the flagship config, on the real chip.

Tunnel notes (this environment): first compile of a full-model program takes
minutes through the remote-compile tunnel; keep everything in ONE process and
never run a second TPU client concurrently.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

from tests.oracles import np_nms  # noqa: E402
from tests.test_boxes import random_boxes  # noqa: E402


def _selection(idx, valid):
    idx, valid = np.asarray(idx), np.asarray(valid)
    return list(idx[valid])


# ------------------------------------------------------------------ kernels
def test_nms_pallas_real_shapes(rng):
    """Mosaic-compiled NMS at proposal-generation shape (6000 -> 300)."""
    from tpudet.kernels.nms import nms_pallas

    boxes = random_boxes(rng, 6000, size=900.0)
    scores = rng.uniform(0, 1, 6000).astype(np.float32)
    idx, valid = jax.jit(
        lambda b, s: nms_pallas(b, s, 0.7, 300)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    got = _selection(idx, valid)
    want = np_nms(boxes, scores, 0.7, 300)
    assert got == want


def test_nms_pallas_presorted_real_shapes(rng):
    """The presorted fast path (what proposal generation uses) on TPU."""
    from tpudet.kernels.nms import nms_pallas

    boxes = random_boxes(rng, 4096, size=900.0)
    scores = np.sort(rng.uniform(0, 1, 4096).astype(np.float32))[::-1].copy()
    idx, valid = jax.jit(
        lambda b, s: nms_pallas(b, s, 0.7, 300, presorted=True)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    got = _selection(idx, valid)
    want = np_nms(boxes, scores, 0.7, 300)
    assert got == want


def test_nms_pallas_ragged_padded_4507(rng):
    """Regression for the round-1 TPU worker crash: the FPN per-level union
    produces ragged candidate counts (4507 when P6 has fewer anchors than
    the per-level top-k); faster_rcnn pads them to a multiple of 512 with
    invalid rows before the kernel (faster_rcnn.py proposal path). Assert
    the padded call is correct ON the real chip at exactly that shape."""
    from tpudet.kernels.nms import nms_pallas

    n_ragged = 4507
    pad = (-n_ragged) % 512
    boxes = random_boxes(rng, n_ragged, size=800.0)
    scores = rng.uniform(0, 1, n_ragged).astype(np.float32)
    boxes_p = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    scores_p = np.concatenate([scores, np.full(pad, -1.0, np.float32)])
    valid_p = np.concatenate([np.ones(n_ragged, bool), np.zeros(pad, bool)])

    idx, valid = jax.jit(
        lambda b, s, v: nms_pallas(b, s, 0.7, 1000, valid_mask=v)
    )(jnp.asarray(boxes_p), jnp.asarray(scores_p), jnp.asarray(valid_p))
    got = _selection(idx, valid)
    want = np_nms(boxes, scores, 0.7, 1000)
    assert got == want


def test_roi_align_backends_match_on_tpu(rng):
    """Pallas + MXU-einsum RoI Align vs the jnp gather oracle, compiled for
    the real chip (the CPU tier only ever runs these in interpret mode)."""
    from tpudet.kernels.roi_align import roi_align_pallas
    from tpudet.ops.roi_align import roi_align, roi_align_mxu

    h, w, c = 40, 64, 256
    feat = rng.normal(0, 1, (h, w, c)).astype(np.float32)
    n = 64
    xy1 = rng.uniform(0, 40, (n, 2)).astype(np.float32)
    wh = rng.uniform(2, 24, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)

    feat_j, rois_j = jnp.asarray(feat), jnp.asarray(rois)
    want = np.asarray(jax.jit(
        lambda f, r: roi_align(f, r, 7, 2)
    )(feat_j, rois_j))
    got_mxu = np.asarray(jax.jit(
        lambda f, r: roi_align_mxu(f, r, 7, 2)
    )(feat_j, rois_j))
    got_pallas = np.asarray(jax.jit(
        lambda f, r: roi_align_pallas(f, r, 7, 2)
    )(feat_j, rois_j))
    np.testing.assert_allclose(got_mxu, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_pallas, want, rtol=1e-4, atol=1e-4)


def test_roi_align_window_pallas_real_shapes(rng):
    """The no-pack windowed FPN pooler (per-level HBM refs, level-branched
    tile DMA) Mosaic-compiled at real coco_r101_fpn shapes (1344-px canvas
    pyramid, 300 RoIs, window 56) vs the masked-sum oracle under the same
    fit-bumped level assignment."""
    from tpudet.kernels.roi_align_window import roi_align_window_pallas
    from tpudet.ops.roi_align import fpn_assign_levels, roi_align_mxu

    c = 256
    shapes = ((336, 336), (168, 168), (84, 84), (42, 42))
    strides = (4.0, 8.0, 16.0, 32.0)
    feats = [
        jnp.asarray(rng.normal(0, 1, (h, w, c)).astype(np.float32))
        for h, w in shapes
    ]
    n = 300
    xy1 = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 900, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy1, np.minimum(xy1 + wh, 1344.0)], -1)
    rois[0] = [0.0, 0.0, 5.0, 1300.0]      # border sliver -> fit-bumped
    rois[1] = [0.0, 0.0, 1344.0, 1344.0]   # canvas-sized -> p5
    rois = jnp.asarray(rois.astype(np.float32))

    window = 56
    levels = fpn_assign_levels(rois, fit_window=window) - 2
    got = np.asarray(jax.jit(
        lambda f, r, l: roi_align_window_pallas(
            list(f), strides, r, l, 7, 2, window=window
        )
    )(feats, rois, levels))

    lv = np.asarray(levels)
    want = 0.0
    for li, (f, s) in enumerate(zip(feats, strides)):
        p = np.asarray(jax.jit(
            lambda f, r: roi_align_mxu(f, r, 7, 2)
        )(f, rois / s))
        want = want + p * (lv == li)[:, None, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # Batched entry at the same real shapes: b=2 images sharing the grid of
    # ONE pallas_call (image index rides the prefetched origins). Image 0
    # reuses the RoIs above, image 1 a shifted set, features distinct per
    # image — a wrong image index shows up as a tolerance blowout.
    from tpudet.kernels.roi_align_window import (
        roi_align_window_pallas_batched,
    )

    feats2 = [
        jnp.asarray(rng.normal(0, 1, f.shape).astype(np.float32))
        for f in feats
    ]
    rois2 = jnp.clip(rois + 64.0, 0.0, 1344.0)
    levels2 = fpn_assign_levels(rois2, fit_window=window) - 2
    feats_b = [jnp.stack([a, b]) for a, b in zip(feats, feats2)]
    rois_b = jnp.stack([rois, rois2])
    levels_b = jnp.stack([levels, levels2])
    got_b = np.asarray(jax.jit(
        lambda f, r, l: roi_align_window_pallas_batched(
            list(f), strides, r, l, 7, 2, window=window
        )
    )(feats_b, rois_b, levels_b))
    np.testing.assert_allclose(got_b[0], want, rtol=1e-3, atol=1e-3)
    lv2 = np.asarray(levels2)
    want2 = 0.0
    for li, (f, s) in enumerate(zip(feats2, strides)):
        p = np.asarray(jax.jit(
            lambda f, r: roi_align_mxu(f, r, 7, 2)
        )(f, rois2 / s))
        want2 = want2 + p * (lv2 == li)[:, None, None, None]
    np.testing.assert_allclose(got_b[1], want2, rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------- full model
def _flagship_cfg():
    import dataclasses

    from tpudet.cli.common import preset_config

    cfg = preset_config("voc_r50")
    # One static canvas (not 5 aspect buckets) to bound compile count; bf16
    # compute exactly like bench.py's flagship measurement.
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", aspect_buckets=(),
            canvas_height=640, canvas_width=1024,
        ),
        backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16"),
    )
    return cfg


def _flagship_batch(cfg, batch_size):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=500,
    )
    loader = DataLoader(cfg, ds, batch_size, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    return device_preprocess(cfg, {k: jnp.asarray(v) for k, v in raw.items()})


@pytest.fixture(scope="module")
def flagship():
    from tpudet.models import FasterRCNN

    cfg = _flagship_cfg()
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    batch = _flagship_batch(cfg, batch_size=2)
    return cfg, model, variables, batch


def test_predict_flagship_pallas_vs_xla(flagship):
    """Full flagship predict on the real chip, Pallas kernels vs the pure-XLA
    fallback path in the same process: structural sanity + cross-path
    agreement of the detection sets (bf16 tolerances)."""
    from tpudet.models import FasterRCNN
    from tests.oracles import np_iou

    cfg, model, variables, batch = flagship
    out_p = jax.jit(model.predict)(variables, batch)
    out_p = {k: np.asarray(v) for k, v in out_p.items()}

    model_x = FasterRCNN(cfg.replace(use_pallas=False))
    out_x = jax.jit(model_x.predict)(variables, batch)
    out_x = {k: np.asarray(v) for k, v in out_x.items()}

    h, w = cfg.data.canvas_height, cfg.data.canvas_width
    for out in (out_p, out_x):
        assert np.all(np.isfinite(out["boxes"])) and np.all(
            np.isfinite(out["scores"])
        )
        v = out["valid"]
        assert np.all(out["scores"][v] > 0) and np.all(out["scores"][v] <= 1)
        assert np.all(out["boxes"][v][:, [0, 2]] >= 0)
        assert np.all(out["boxes"][v][:, [0, 2]] <= w)
        assert np.all(out["boxes"][v][:, [1, 3]] <= h)

    total = matched = 0
    for i in range(out_p["boxes"].shape[0]):
        vp, vx = out_p["valid"][i], out_x["valid"][i]
        bp, bx = out_p["boxes"][i][vp], out_x["boxes"][i][vx]
        sp, sx = out_p["scores"][i][vp], out_x["scores"][i][vx]
        cp, cx = out_p["classes"][i][vp], out_x["classes"][i][vx]
        total += len(bp)
        if len(bp) == 0 or len(bx) == 0:
            continue
        iou = np_iou(bp, bx)
        used = np.zeros(len(bx), bool)
        for a in range(len(bp)):
            for b in range(len(bx)):
                if (not used[b] and iou[a, b] > 0.9 and cp[a] == cx[b]
                        and abs(sp[a] - sx[b]) < 0.05):
                    used[b] = True
                    matched += 1
                    break
    assert total > 0, "flagship predict produced no detections"
    assert matched >= 0.8 * total, f"pallas/xla agreement {matched}/{total}"


def test_train_step_flagship(flagship):
    """One flagship train step on the real chip: finite loss + metrics."""
    import dataclasses

    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg, model, variables, batch = flagship
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        )
    )
    from tpudet.models import FasterRCNN

    model_t = FasterRCNN(cfg)
    state = create_train_state(model_t, cfg.train, jax.random.key(0))
    step = make_train_step(model_t, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert metrics["num_pos_anchors"] >= 0


def test_train_step_fpn_windowed_accum():
    """Gradient accumulation (lax.scan over microbatches) composed with the
    windowed-pooler custom VJP (Pallas forward, masked-sum-transpose
    backward), compiled through Mosaic on the real chip — the one
    composition the CPU tier cannot see (CPU training falls through to the
    masked sum; interpret mode is not Mosaic)."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import FasterRCNN
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("voc_r50")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", aspect_buckets=(),
            canvas_height=512, canvas_width=512,
        ),
        backbone=dataclasses.replace(
            cfg.backbone, dtype="bfloat16", use_fpn=True
        ),
        roi=dataclasses.replace(
            cfg.roi, pooler="roi_align_window", window=32
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=4, accum_steps=2, num_data_shards=1,
            bf16=True,
        ),
    )
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = _flagship_batch(cfg, batch_size=4)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert int(jax.device_get(state.step)) == 1


def test_mask_rcnn_step_and_predict_on_tpu():
    """Mask family on the real chip: the separable-bilinear mask-target
    einsums, the FCN + deconv, and the mask gather/sigmoid all compile and
    run next to the Pallas proposal path (windowed pooler at two output
    sizes in one program — 7^2 box head + 14^2 mask branch)."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_maskrcnn_r50_fpn")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512,
        ),
        roi=dataclasses.replace(cfg.roi, window=32),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500,
                          with_masks=True)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert 0.0 < metrics["mask_loss"] < 2.0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    s = 2 * cfg.mask.roi_output_size
    assert out["masks"].shape == (2, cfg.roi.max_detections, s, s)
    m = out["masks"]
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()


def test_fcos_step_and_predict_on_tpu():
    """Anchor-free family on the real chip: the dense [points, gt]
    assignment, GIoU loss, GN towers + per-level exp scales, and the
    sigmoid-product top-k + class-aware NMS postprocess all compile through
    Mosaic/XLA-TPU and run in one program each for train and predict."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_fcos_r50")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert 0.0 < metrics["giou_box_loss"] <= 2.0
    assert metrics["num_pos_points"] > 0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["boxes"].shape == (2, cfg.fcos.max_detections, 4)
    assert np.isfinite(out["boxes"]).all()


def test_vitdet_step_and_predict_on_tpu():
    """ViTDet on the real chip: window partitioning + global attention +
    the simple feature pyramid's deconvs compile through XLA-TPU at a
    real-ish scale (512 px -> 32x32 token grid, window 14 pads to 42 —
    both the padded-window and global branches run), one train step and
    one predict. Shapes matter on this backend (the deformable one-hot
    OOM was invisible at tiny scale), hence the 512 canvas."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_vitdet_b")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["boxes"].shape == (2, cfg.roi.max_detections, 4)
    assert np.isfinite(out["boxes"]).all()


def test_retinanet_step_and_predict_on_tpu():
    """Single-stage anchor family on the real chip: focal loss over ALL
    anchors, shared towers, and the postprocess in BOTH selection
    formulations — the class-max prefilter (the fix for the 82.65
    img/s/chip flattened-selection pathology, KERNELS.md) and the
    paper-exact flattened top-k — which must agree on the chip's own
    arithmetic, not just in interpret mode (P3 at 512 px = 36.9k anchors
    per level vs pre_nms_topk=1000, so the prefilter branch really runs)."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_retinanet_r50")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert metrics["num_pos_anchors"] > 0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["boxes"].shape == (2, cfg.retinanet.max_detections, 4)
    assert np.isfinite(out["boxes"]).all()

    exact = build_model(cfg.replace(
        retinanet=dataclasses.replace(cfg.retinanet, prefilter="off")
    ))
    out_exact = jax.device_get(jax.jit(exact.predict)(state.variables, batch))
    for key in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(out[key], out_exact[key], err_msg=key)


def test_cascade_rcnn_step_and_predict_on_tpu():
    """Cascade family on the real chip: three pooling+head rounds (two in
    predict's chain before the final), stage re-labeling, and the shared
    NMS tail compile through Mosaic/XLA-TPU in one program each."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_cascade_r50_fpn")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512,
        ),
        roi=dataclasses.replace(cfg.roi, window=32),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    for t in (1, 2, 3):
        assert np.isfinite(metrics[f"det_cls_loss_s{t}"])

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["boxes"].shape == (2, cfg.roi.max_detections, 4)
    assert np.isfinite(out["boxes"]).all()


def test_keypoint_rcnn_step_and_predict_on_tpu():
    """Keypoint family on the real chip: the grid-index target arithmetic,
    the 512-wide FCN + deconv + bilinear upsample, and the per-keypoint
    argmax decode compile through Mosaic/XLA-TPU next to the Pallas
    proposal path."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_keypoint_r50_fpn")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512,
            num_keypoints=5, keypoint_flip_pairs=((1, 2),),
            keypoint_sigmas=(0.1,) * 5,
        ),
        roi=dataclasses.replace(cfg.roi, window=32),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500,
                          with_keypoints=True)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert 0.0 < metrics["keypoint_loss"] < 20.0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["keypoints"].shape == (2, cfg.roi.max_detections, 5, 3)
    assert np.isfinite(out["keypoints"]).all()


def test_panoptic_fpn_step_and_predict_on_tpu():
    """Panoptic family on the real chip: the semantic FCN (GN towers +
    bilinear upsamples over p2..p5) and its CE train next to the full mask
    pipeline in one program; predict emits the 1/4-scale argmax map."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_panoptic_r50_fpn")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512, num_stuff_classes=1,
        ),
        roi=dataclasses.replace(cfg.roi, window=32),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500,
                          with_masks=True, with_semantic=True)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert 0.0 < metrics["semantic_loss"] < 5.0
    assert 0.0 < metrics["mask_loss"] < 2.0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["semantic"].shape == (2, 128, 128)
    assert out["semantic"].min() >= 1


def test_detr_step_and_predict_on_tpu():
    """Set-prediction family on the real chip: the transformer encoder/
    decoder (the MXU attention path), the in-jit Jonker-Volgenant Hungarian
    matching (sequential lax.while_loops on the TPU scalar core), aux
    losses, and the NMS-free top-k postprocess all compile and run in one
    program each for train and predict."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_detr_r50")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512, max_gt_boxes=20,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert metrics["num_gt"] > 0
    assert 0.0 < metrics["giou_box_loss"] <= 2.0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["boxes"].shape == (2, cfg.detr.max_detections, 4)
    assert np.isfinite(out["boxes"]).all()


def test_deformable_patch_gather_matches_flat_on_tpu(rng):
    """Patch-gather vs flat-gather deformable sampling ON THE CHIP at
    mid-size multi-level shapes (r3 lesson: TPU gather lowering depends on
    SHAPES — the CPU equivalence tests cannot see expander rewrites). Also
    pins the head-shared layout against flat with broadcast locations."""
    from tpudet.ops.deform_attn import (
        ms_deform_attn_batched,
        ms_deform_attn_patch,
    )

    level_shapes = ((52, 52), (26, 26), (13, 13), (7, 7))
    n = sum(h * w for h, w in level_shapes)
    b, q, heads, p, d = 2, n, 8, 4, 32
    values = rng.normal(0, 1, (b, n, heads, d)).astype(np.float32)
    loc = rng.uniform(
        -0.2, 1.2, (b, q, heads, len(level_shapes), p, 2)
    ).astype(np.float32)
    w = rng.random((b, q, heads, len(level_shapes), p)).astype(np.float32)

    vj, lj, wj = jnp.asarray(values), jnp.asarray(loc), jnp.asarray(w)
    want = np.asarray(jax.device_get(jax.jit(
        lambda v, l, ww: ms_deform_attn_batched(v, level_shapes, l, ww)
    )(vj, lj, wj)))
    got = np.asarray(jax.device_get(jax.jit(
        lambda v, l, ww: ms_deform_attn_patch(v, level_shapes, l, ww)
    )(vj, lj, wj)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    loc_shared = jnp.asarray(loc[:, :, 0])
    want_s = np.asarray(jax.device_get(jax.jit(
        lambda v, l, ww: ms_deform_attn_batched(
            v, level_shapes,
            jnp.broadcast_to(l[:, :, None], lj.shape), ww)
    )(vj, loc_shared, wj)))
    got_s = np.asarray(jax.device_get(jax.jit(
        lambda v, l, ww: ms_deform_attn_patch(v, level_shapes, l, ww)
    )(vj, loc_shared, wj)))
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-4)


def test_deformable_mxu_kernel_on_tpu(rng):
    """One-hot MXU deformable-sampling kernel Mosaic-compiled on the real
    chip at mid-size multi-level shapes: forward equality against the flat
    XLA gather, and the custom-VJP backward produces matching value
    gradients (the train path's dV is cross-tile block accumulation —
    worth proving on real Mosaic, not just interpret mode)."""
    from tpudet.kernels.deform_attn_mxu import ms_deform_attn_mxu
    from tpudet.ops.deform_attn import ms_deform_attn_batched

    level_shapes = ((52, 52), (26, 26), (13, 13), (7, 7))
    n = sum(h * w for h, w in level_shapes)
    b, q, heads, p, d = 2, 1024, 8, 4, 32
    values = rng.normal(0, 1, (b, n, heads, d)).astype(np.float32)
    loc = rng.uniform(
        -0.2, 1.2, (b, q, heads, len(level_shapes), p, 2)
    ).astype(np.float32)
    w = rng.random((b, q, heads, len(level_shapes), p)).astype(np.float32)

    vj = jnp.asarray(values, jnp.bfloat16)
    lj, wj = jnp.asarray(loc), jnp.asarray(w)
    want = np.asarray(jax.device_get(jax.jit(
        lambda v, l, ww: ms_deform_attn_batched(v, level_shapes, l, ww)
    )(vj, lj, wj)))
    got = np.asarray(jax.device_get(jax.jit(
        lambda v, l, ww: ms_deform_attn_mxu(v, level_shapes, l, ww)
    )(vj, lj, wj)))
    # atol: the round-5 weight-folded selectors carry three bf16x2 split
    # sources (~3 * P*4*|v.w| * 2^-18 worst case) — derivation in
    # tests/test_deform_attn_mxu.py's module docstring.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=4e-4)

    def loss_of(fn):
        def f(v, l, ww):
            out = fn(v, level_shapes, l, ww)
            return jnp.sum(out * jnp.sin(0.01 * jnp.arange(out.size)
                                         .reshape(out.shape)))
        return f

    gv_f = jax.device_get(jax.jit(jax.grad(loss_of(
        ms_deform_attn_batched)))(vj, lj, wj))
    gv_m = jax.device_get(jax.jit(jax.grad(loss_of(
        ms_deform_attn_mxu)))(vj, lj, wj))
    np.testing.assert_allclose(
        np.asarray(gv_m, np.float32), np.asarray(gv_f, np.float32),
        rtol=5e-2, atol=5e-2,  # bf16 value-grad quantization, both paths
    )


def test_deformable_detr_step_and_predict_on_tpu():
    """Deformable DETR on the real chip: multi-scale deformable attention
    (the fused XLA gather path — KERNELS.md treatment row), the sparse
    sampling-offset network, iterative box refinement, and the shared
    Hungarian set loss all compile through Mosaic/XLA-TPU and run in one
    program each for train and predict."""
    import dataclasses

    from tpudet.cli.common import preset_config
    from tpudet.models import build_model
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = preset_config("coco_deformable_detr_r50")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", num_classes=8, aspect_buckets=(),
            canvas_height=512, canvas_width=512, max_gt_boxes=20,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, num_data_shards=1, bf16=True
        ),
    )
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(num_classes=8, num_examples=2, image_size=500)
    loader = DataLoader(cfg, ds, 2, shuffle=False, num_workers=2)
    raw = next(iter(loader.batches(0)))
    batch = device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()}
    )

    step = make_train_step(model, cfg)
    state, metrics = step(state, batch)
    metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert metrics["num_gt"] > 0
    assert 0.0 < metrics["giou_box_loss"] <= 2.0

    out = jax.device_get(jax.jit(model.predict)(state.variables, batch))
    assert out["boxes"].shape == (
        2, cfg.deformable_detr.max_detections, 4)
    assert np.isfinite(out["boxes"]).all()
