"""Mask R-CNN family tests (arXiv:1703.06870; a build extra beyond the
box-only reference). Strategy mirrors the other families: mask geometry
against hand-built scenes and closed-form oracles, RLE decode against a
from-spec encoder, loss semantics by hand expectation, segm-mAP protocol
discrimination (mask IoU, not box IoU), short-horizon training signal,
mesh composition, CLI + serving smoke."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_maskrcnn_config
from tpudet.data.masks import (
    crop_from_full,
    crop_from_polys,
    mask_iou_matrix,
    paste_mask,
    rle_counts_from_string,
    rle_decode,
)
from tpudet.models import MaskRCNN, build_model
from tpudet.ops.masks import crop_mask_to_roi, mask_targets
from tpudet.train.losses import mask_loss


def make_batch(cfg, batch_size=2, seed=0, training=False, rng=None):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=cfg.data.canvas_height, seed=seed, with_masks=True,
    )
    raw = next(iter(DataLoader(cfg, ds, batch_size, shuffle=False).batches(0)))
    return device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()},
        rng=rng, training=training,
    )


# --------------------------------------------------------------------- RLE
def _rle_encode_string(counts):
    """From-spec inverse of rle_counts_from_string (pycocotools rleToString):
    delta-code from the 3rd count on, then 5-bit signed varints offset by
    48. Test-side only — exists to prove the decoder against the format."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_rle_decode_uncompressed():
    # Column-major runs: 2 bg, 3 fg, rest bg on a 3x4 mask.
    mask = rle_decode({"size": [3, 4], "counts": [2, 3, 7]})
    want = np.zeros((3, 4), np.uint8)
    want[2, 0] = 1  # pixel 2 (col-major)
    want[0, 1] = 1  # pixel 3
    want[1, 1] = 1  # pixel 4
    np.testing.assert_array_equal(mask, want)
    with pytest.raises(ValueError, match="cover"):
        rle_decode({"size": [3, 4], "counts": [2, 3]})


def test_rle_string_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        h, w = int(rng.integers(3, 40)), int(rng.integers(3, 40))
        flat = (rng.random(h * w) < 0.3).astype(np.uint8)
        # Build column-major runs.
        counts, val, run = [], 0, 0
        for v in flat:
            if v == val:
                run += 1
            else:
                counts.append(run)
                val, run = v, 1
        counts.append(run)
        s = _rle_encode_string(counts)
        assert rle_counts_from_string(s) == counts
        dec = rle_decode({"size": [h, w], "counts": s})
        np.testing.assert_array_equal(dec, flat.reshape(w, h).T)


def test_rle_encode_roundtrip_and_paste():
    """Library encoder against the (independently proven) decoder, plus the
    detection-export path: box-frame probs -> full-image RLE."""
    from tpudet.data.masks import mask_to_rle, rle_encode

    rng = np.random.default_rng(2)
    for _ in range(10):
        h, w = int(rng.integers(2, 50)), int(rng.integers(2, 50))
        m = (rng.random((h, w)) < 0.4).astype(np.uint8)
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)
    # Leading-foreground pixel forces the zero-length background run.
    m = np.ones((3, 3), np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)

    rle = mask_to_rle(np.ones((8, 8), np.float32), [2.0, 1.0, 6.0, 5.0],
                      (10, 12))
    full = rle_decode(rle)
    assert full.shape == (10, 12)
    want = np.zeros((10, 12), np.uint8)
    want[1:5, 2:6] = 1
    np.testing.assert_array_equal(full, want)


# ------------------------------------------------------------ crop / paste
def test_crop_paste_roundtrip():
    """Full mask -> box-frame crop -> paste recovers the original blob."""
    full = np.zeros((60, 80), np.uint8)
    full[10:40, 20:70] = 1
    box = [20.0, 10.0, 70.0, 40.0]
    crop = crop_from_full(full, box, 28)
    assert crop.mean() > 0.98  # box frame exactly covers the blob
    y0, x0, pasted = paste_mask(crop, box)
    got = np.zeros_like(full, bool)
    got[y0 : y0 + pasted.shape[0], x0 : x0 + pasted.shape[1]] = pasted
    inter = np.logical_and(got, full).sum()
    union = np.logical_or(got, full).sum()
    assert inter / union > 0.95


def test_crop_from_polys_half_box():
    """A polygon covering the left half of the box rasterizes to ~half the
    crop, on the correct side."""
    box = [10.0, 20.0, 50.0, 60.0]
    poly = [10.0, 20.0, 30.0, 20.0, 30.0, 60.0, 10.0, 60.0]
    crop = crop_from_polys([poly], box, 28)
    assert crop[:, :12].mean() > 0.95
    assert crop[:, 16:].mean() < 0.05


def test_crop_mask_to_roi_identity_and_outside():
    rng = np.random.default_rng(1)
    m = 16
    gt = (rng.random((m, m)) < 0.5).astype(np.float32)
    box = jnp.array([8.0, 4.0, 40.0, 36.0])
    # RoI == GT box at the native resolution -> exact identity (the sample
    # grid hits every crop pixel center).
    out = crop_mask_to_roi(jnp.asarray(gt), box, box, m)
    np.testing.assert_allclose(np.asarray(out), gt, atol=1e-6)
    # RoI fully outside the GT box -> all zeros (hat rows vanish).
    far = jnp.array([100.0, 100.0, 130.0, 130.0])
    out = crop_mask_to_roi(jnp.asarray(gt), box, far, m)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_mask_targets_selects_matched_gt():
    m, s = 8, 4
    gt_masks = jnp.stack([jnp.ones((m, m)), jnp.zeros((m, m))])
    gt_boxes = jnp.array([[0.0, 0.0, 32.0, 32.0], [40.0, 40.0, 60.0, 60.0]])
    rois = jnp.array([[8.0, 8.0, 24.0, 24.0], [8.0, 8.0, 24.0, 24.0]])
    matched = jnp.array([0, 1], jnp.int32)
    t = mask_targets(gt_masks, gt_boxes, rois, matched, s)
    np.testing.assert_array_equal(np.asarray(t[0]), 1.0)  # inside all-ones GT
    np.testing.assert_array_equal(np.asarray(t[1]), 0.0)  # all-zero GT


# ------------------------------------------------------------------- data
def test_synthetic_masks_consistent():
    from tpudet.data import SyntheticDataset

    ds = SyntheticDataset(num_classes=3, num_examples=4, image_size=64,
                          with_masks=True)
    plain = SyntheticDataset(num_classes=3, num_examples=4, image_size=64)
    for i in range(4):
        ex, exp = ds.get_example(i), plain.get_example(i)
        # Same rng draw order: boxes/classes identical to the box-only mode.
        np.testing.assert_array_equal(ex["boxes"], exp["boxes"])
        np.testing.assert_array_equal(ex["classes"], exp["classes"])
        assert len(ex["masks"]) == len(ex["boxes"])
        for mask, box in zip(ex["masks"], ex["boxes"]):
            x1, y1, x2, y2 = box.astype(int)
            # Mask confined to its box, elliptical coverage ~pi/4 of it.
            assert mask[:y1].sum() == 0 and mask[y2:].sum() == 0
            frac = mask.sum() / max((x2 - x1) * (y2 - y1), 1)
            assert 0.55 < frac < 0.9


def test_loader_emits_gt_masks_and_flip():
    cfg = tiny_maskrcnn_config()
    batch = make_batch(cfg, batch_size=2)
    assert "gt_masks" in batch
    g, m = cfg.data.max_gt_boxes, cfg.data.gt_mask_size
    assert batch["gt_masks"].shape == (2, g, m, m)
    # Valid instances have nonzero crops (ellipse fills the box frame).
    gm = np.asarray(batch["gt_masks"], np.float32)
    valid = np.asarray(batch["gt_valid"])
    per = gm.reshape(2, g, -1).mean(-1)
    assert (per[valid] > 0.5).all() and (per[~valid] == 0).all()

    # Force-flip determinism: find a key whose bernoulli flips row 0, then
    # check the crop mirrored left-right.
    from tpudet.data.preprocess import device_preprocess

    raw = make_batch(cfg, batch_size=2)  # un-flipped reference
    for seed in range(20):
        rng = jax.random.PRNGKey(seed)
        if bool(jax.random.bernoulli(rng, 0.5, (2,))[0]):
            flipped = device_preprocess(
                cfg, dict(raw), rng=rng, training=True
            )
            np.testing.assert_array_equal(
                np.asarray(flipped["gt_masks"][0]),
                np.asarray(raw["gt_masks"][0])[:, :, ::-1],
            )
            break
    else:
        pytest.fail("no flipping key found in 20 seeds")


# ------------------------------------------------------------------ losses
def test_mask_loss_semantics():
    """Zero logits -> ln 2 per pixel on fg rows only; class selection picks
    the matched channel; zero-fg batches return exactly 0."""
    r, s, c = 4, 6, 3
    logits = jnp.zeros((r, s, s, c)).at[1, :, :, 1].set(50.0)
    targets = jnp.zeros((r, s, s)).at[1].set(1.0)
    classes = jnp.array([1, 2, 1, 1], jnp.int32)
    fg = jnp.array([True, True, False, False])
    # Row 0: target class 1 -> channel 0 (zeros) vs target 0 -> ln2/pixel.
    # Row 1: class 2 -> channel 1 (logit 50) vs target 1 -> ~0 loss.
    got = float(mask_loss(logits, targets, classes, fg))
    assert got == pytest.approx(math.log(2) / 2, rel=1e-4)
    assert float(mask_loss(logits, targets, classes, jnp.zeros(4, bool))) == 0.0
    # Class-agnostic head: single channel used regardless of class.
    ag = float(mask_loss(logits[..., :1], targets, classes, fg))
    assert ag == pytest.approx(math.log(2), rel=1e-4)


# ------------------------------------------------------------- segm metric
def _ellipse_crop(m):
    yy, xx = np.mgrid[:m, :m]
    return ((((xx + 0.5) / m - 0.5) ** 2 + ((yy + 0.5) / m - 0.5) ** 2)
            <= 0.25).astype(np.float32)


def test_mask_iou_box_vs_ellipse():
    """Filled-box prediction against an inscribed-ellipse GT on the same box
    scores IoU ~= pi/4 — proving segm IoU is mask IoU, not box IoU (which
    would be 1.0)."""
    box = np.array([[10.0, 10.0, 74.0, 74.0]])
    full = np.ones((28, 28), np.float32)
    ell = _ellipse_crop(56)
    iou = mask_iou_matrix(box, [full], box, [ell])
    assert iou[0, 0] == pytest.approx(math.pi / 4, abs=0.02)
    # Crowd convention: intersection over DETECTION area -> 1.0 (the
    # ellipse-GT covers... no: det=box covers ellipse, inter=ellipse area,
    # det area=box area -> pi/4 again but from the other denominator).
    iou_crowd = mask_iou_matrix(
        box, [ell], box, [full], g_crowd=np.array([True])
    )
    assert iou_crowd[0, 0] == pytest.approx(1.0, abs=0.02)


@pytest.mark.parametrize("style", ["voc", "coco"])
def test_segm_evaluator_protocol(style):
    """Perfect masks -> segm mAP 1; box-fill predictions vs ellipse GT pass
    at IoU 0.5 (pi/4 > 0.5) but fail at 0.9 — the box evaluator would say
    1.0 either way."""
    from tpudet.eval.metrics import CocoStyleEvaluator, DetectionEvaluator

    boxes = np.array([[8.0, 8.0, 40.0, 40.0], [50.0, 20.0, 90.0, 60.0]])
    classes = np.array([1, 2])
    scores = np.array([0.9, 0.8])
    ell = _ellipse_crop(28)
    fill = np.ones((28, 28), np.float32)
    gts = [ell, ell]

    if style == "coco":
        perfect = CocoStyleEvaluator(2, iou_type="segm")
        perfect.add_image(boxes, scores, classes, boxes, classes,
                          pred_masks=gts, gt_masks=gts)
        s = perfect.summarize()
        assert s["mAP@0.5"] == pytest.approx(1.0)
        assert s["mAP"] > 0.9  # near-exact across 0.5:0.95

        sloppy = CocoStyleEvaluator(2, iou_type="segm")
        sloppy.add_image(boxes, scores, classes, boxes, classes,
                         pred_masks=[fill, fill], gt_masks=gts)
        s2 = sloppy.summarize()
        assert s2["mAP@0.5"] == pytest.approx(1.0)   # pi/4 > 0.5
        assert s2["mAP@0.75"] == pytest.approx(1.0)  # pi/4 > 0.75
        # High banks (0.85+) miss: pixel IoU sits near pi/4 ~ 0.785 with
        # small discretization wiggle per box size -> mAP lands in the
        # 0.6-0.65 band, far from the 1.0 a box-IoU matcher would report.
        assert 0.55 <= s2["mAP"] <= 0.7
    else:
        for thresh, want in [(0.5, 1.0), (0.9, 0.0)]:
            ev = DetectionEvaluator(2, iou_thresh=thresh, iou_type="segm",
                                    interpolation="all_points")
            ev.add_image(boxes, scores, classes, boxes, classes,
                         pred_masks=[fill, fill], gt_masks=gts)
            assert ev.summarize()["mAP"] == pytest.approx(want)
        with pytest.raises(ValueError, match="segm"):
            ev = DetectionEvaluator(2, iou_type="segm")
            ev.add_image(boxes, scores, classes, boxes, classes)


# ------------------------------------------------------------------- model
def test_factory_and_modes():
    cfg = tiny_maskrcnn_config()
    assert isinstance(build_model(cfg), MaskRCNN)
    with pytest.raises(ValueError, match="rpn_only"):
        MaskRCNN(cfg.replace(rpn_only=True))


@pytest.mark.slow
def test_loss_and_predict_surface():
    """Mask branch in both jittable programs: loss carries a finite
    mask_loss (~ln 2 at init — sigmoid masks start uninformative), predict
    emits per-detection box-frame probability masks gated by validity."""
    cfg = tiny_maskrcnn_config()
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    batch = make_batch(cfg, training=True, rng=jax.random.PRNGKey(3))
    loss, metrics = model.loss(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert 0.6 < float(metrics["mask_loss"]) < 0.8
    # gt_masks missing -> loud error, not a silent box-only step.
    nomask = {k: v for k, v in batch.items() if k != "gt_masks"}
    with pytest.raises(KeyError, match="gt_masks"):
        model.loss(variables, nomask, jax.random.PRNGKey(1))

    out = model.predict(variables, batch)
    s = 2 * cfg.mask.roi_output_size
    d = cfg.roi.max_detections
    assert out["masks"].shape == (2, d, s, s)
    m = np.asarray(out["masks"])
    assert ((m >= 0) & (m <= 1)).all()
    valid = np.asarray(out["valid"])
    assert (m[~valid] == 0).all()


@pytest.mark.slow
def test_mask_loss_decreases():
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_maskrcnn_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, learning_rate=0.02, warmup_steps=0,
    ))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = make_batch(cfg)
    first_mask = first = None
    for _ in range(30):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
            first_mask = float(metrics["mask_loss"])
    assert float(metrics["loss"]) < 0.8 * first
    assert float(metrics["mask_loss"]) < 0.85 * first_mask


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_maskrcnn_config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=8))
    model = build_model(cfg)
    mesh = make_mesh(num_data=8)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg, mesh=mesh)
    batch = shard_batch(mesh, make_batch(cfg, batch_size=8))
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["mask_loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "maskrcnn_tiny", "--dataset", "synthetic",
        "--steps", "2", "--no-mesh",
    ])
    assert "mask_loss" in capsys.readouterr().out

    import json

    summary = eval_cli.main([
        "--preset", "maskrcnn_tiny", "--dataset", "synthetic",
        "--max-images", "4", "--no-mesh",
        "--save-json", "/tmp/mrcnn_results.json",
    ])
    assert "mAP" in summary and "segm/mAP" in summary
    with open("/tmp/mrcnn_results.json") as f:
        results = json.load(f)
    if results:  # untrained model may emit zero detections
        seg = results[0]["segmentation"]
        assert isinstance(seg["counts"], str) and len(seg["size"]) == 2


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_maskrcnn_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "maskrcnn.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "mask_rcnn"

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (1, 128, 128, 3), np.uint8)
    hw = np.array([[128.0, 128.0]], np.float32)
    got = jax.device_get(ServingModel.load(str(path))(image, hw))
    from tpudet.data.preprocess import device_preprocess

    batch = device_preprocess(
        cfg, {"image": jnp.asarray(image), "image_hw": jnp.asarray(hw)},
        training=False,
    )
    want = jax.device_get(model.predict(variables, batch))
    np.testing.assert_array_equal(got["valid"], want["valid"])
    np.testing.assert_allclose(got["masks"], want["masks"], atol=1e-5)
