"""Panoptic FPN family tests (semantic branch + fusion + PQ;
arXiv:1901.02446): semantic loss closed forms, hand-scene fusion and PQ
values against the spec's rules, GT assembly, flip consistency, training
signal, CLI and serving round-trips."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_panoptic_config
from tpudet.models import PanopticFPN, build_model
from tpudet.eval.panoptic import (
    PanopticEvaluator, fuse_panoptic, gt_panoptic,
)
from tpudet.train.losses import semantic_loss


def make_batch(cfg, batch_size=2, seed=0, training=False):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=cfg.data.canvas_height, seed=seed, with_masks=True,
        with_semantic=True,
    )
    raw = next(iter(DataLoader(cfg, ds, batch_size, shuffle=False).batches(0)))
    return device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()},
        jax.random.key(7) if training else None, training=training,
    )


def test_build_model_factory_and_validation():
    cfg = tiny_panoptic_config()
    assert isinstance(build_model(cfg), PanopticFPN)
    with pytest.raises(ValueError, match="use_fpn"):
        PanopticFPN(cfg.replace(
            backbone=dataclasses.replace(cfg.backbone, use_fpn=False)))
    with pytest.raises(ValueError, match="load_semantic"):
        PanopticFPN(cfg.replace(
            data=dataclasses.replace(cfg.data, load_semantic=False)))


def test_semantic_loss_closed_form():
    b, h, w, c = 1, 4, 4, 4
    logits = jnp.zeros((b, h, w, c))
    tgt = jnp.ones((b, h, w), jnp.int32)
    # Uniform logits: CE = ln(C) on every non-void pixel.
    assert float(semantic_loss(logits, tgt)) == pytest.approx(
        math.log(c), rel=1e-6)
    # Void pixels (0) drop out: half void halves nothing (mean over valid).
    tgt_half = tgt.at[:, :2].set(0)
    assert float(semantic_loss(logits, tgt_half)) == pytest.approx(
        math.log(c), rel=1e-6)
    # All void: exactly 0.
    assert float(semantic_loss(logits, jnp.zeros_like(tgt))) == 0.0
    # Near-one-hot at the target channel: ~0.
    hot = jnp.full((b, h, w, c), -20.0).at[..., 0].set(20.0)
    assert float(semantic_loss(hot, tgt)) < 1e-6


def test_fuse_and_gt_panoptic_hand_scene():
    """One thing over a stuff background: fusion pastes the instance, fills
    the stuff, respects the overlap-drop and min-area rules."""
    h4 = w4 = 16
    semantic = np.ones((h4, w4), np.int32)  # stuff class 1 everywhere
    semantic[4:8, 4:8] = 2  # the thing's class (S=1, thing 1 -> label 2)
    boxes = np.asarray([[16.0, 16.0, 32.0, 32.0],   # /4 -> [4,4,8,8]
                        [16.0, 16.0, 32.0, 32.0]])  # duplicate (suppressed)
    scores = np.asarray([0.9, 0.8])
    classes = np.asarray([1, 1])
    masks = np.ones((2, 4, 4), np.float32)
    seg, segments = fuse_panoptic(
        boxes, scores, classes, masks, semantic, num_stuff=1,
        overlap_thresh=0.5, stuff_min_area=4, score_thresh=0.5,
    )
    assert len(segments) == 2  # thing + stuff (duplicate dropped)
    thing = [s for s in segments if s["isthing"]][0]
    stuff = [s for s in segments if not s["isthing"]][0]
    assert thing["category"] == 2 and stuff["category"] == 1
    assert (seg[4:8, 4:8] == thing["id"]).all()
    assert (seg[0, 0] == stuff["id"]) and (seg > 0).all()
    # min-area: a stuff class with too few unclaimed pixels is dropped.
    seg2, segs2 = fuse_panoptic(
        boxes[:1], scores[:1], classes[:1], masks[:1], semantic,
        num_stuff=1, stuff_min_area=10**6, score_thresh=0.5,
    )
    assert all(s["isthing"] for s in segs2)

    # GT assembly from the loader's modalities reproduces the same scene.
    gt_sem = semantic.copy()
    gseg, gsegs = gt_panoptic(
        boxes[:1], classes[:1], masks[:1], gt_sem, num_stuff=1,
    )
    assert len(gsegs) == 2
    # Perfect prediction -> PQ 1 everywhere it is defined.
    ev = PanopticEvaluator(num_stuff=1, num_things=1)
    ev.add_image(seg, segments, gseg, gsegs,
                 pred_semantic=semantic, gt_semantic=gt_sem)
    s = ev.summarize()
    assert s["PQ"] == pytest.approx(1.0)
    assert s["SQ"] == pytest.approx(1.0)
    assert s["RQ"] == pytest.approx(1.0)
    assert s["semantic_mIoU"] == pytest.approx(1.0)


def test_pq_matching_rules():
    """The spec's edge rules: IoU must EXCEED 0.5 per category; unmatched
    GT are FN, unmatched predictions FP — unless mostly-void (discarded);
    void pixels leave the IoU union."""
    h4 = w4 = 10
    gt_seg = np.zeros((h4, w4), np.int32)
    gt_seg[:, :6] = 1  # one GT thing segment, category 2, area 60
    gsegs = [{"id": 1, "category": 2, "isthing": True}]
    # Prediction covers 4 of its 6 columns -> IoU 40/60 = 0.66 > 0.5: TP.
    pseg = np.zeros_like(gt_seg)
    pseg[:, :4] = 1
    psegs = [{"id": 1, "category": 2, "isthing": True}]
    ev = PanopticEvaluator(num_stuff=1, num_things=1)
    ev.add_image(pseg, psegs, gt_seg, gsegs)
    s = ev.summarize()
    assert s["PQ_things"] == pytest.approx(40.0 / 60.0)
    assert s["RQ"] == pytest.approx(1.0)

    # Wrong category: FN + FP, PQ 0.
    ev = PanopticEvaluator(num_stuff=1, num_things=2)
    ev.add_image(pseg, [{"id": 1, "category": 3, "isthing": True}],
                 gt_seg, gsegs)
    s = ev.summarize()
    assert s["PQ"] == 0.0

    # A prediction living mostly on VOID pixels is discarded, not an FP.
    pseg2 = np.zeros_like(gt_seg)
    pseg2[:, 7:] = 5  # entirely over gt void
    ev = PanopticEvaluator(num_stuff=1, num_things=1)
    ev.add_image(pseg2, [{"id": 5, "category": 2, "isthing": True}],
                 gt_seg, gsegs)
    # Only the FN from the unmatched GT remains: RQ 0 but no FP inflation.
    assert ev._fp[2] == 0 and ev._fn[2] == 1


def test_gt_semantic_flip_consistency():
    """The quarter-resolution semantic map flips with the image: flipped
    cells must equal the mirror of the original valid cells."""
    from tpudet.data.preprocess import device_preprocess

    cfg = tiny_panoptic_config()
    batch = make_batch(cfg, batch_size=4)
    gs = np.asarray(batch["gt_semantic"])
    gb = np.asarray(batch["gt_boxes"])
    out = device_preprocess(cfg, dict(batch), jax.random.key(1),
                            training=True)
    ob = np.asarray(out["gt_boxes"])
    os_ = np.asarray(out["gt_semantic"])
    flipped_any = False
    for i in range(4):
        if np.allclose(ob[i], gb[i]):
            np.testing.assert_array_equal(os_[i], gs[i])
        else:
            flipped_any = True
            w4 = int(np.ceil((batch["image_hw"][i][1] - 1.5) / 4.0))
            np.testing.assert_array_equal(
                os_[i][:, :w4], gs[i][:, :w4][:, ::-1])
    assert flipped_any  # key 1 flips at least one of four


@pytest.mark.slow
def test_loss_decreases_and_trains():
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_panoptic_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, learning_rate=0.02, warmup_steps=0, batch_size=2,
    ))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = make_batch(cfg)
    first = first_sem = None
    for _ in range(20):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
            first_sem = float(metrics["semantic_loss"])
            # 0.5 * ln(S + C) at the near-zero init.
            want = 0.5 * math.log(
                cfg.data.num_stuff_classes + cfg.data.num_classes)
            assert first_sem == pytest.approx(want, rel=0.1)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first
    assert float(metrics["semantic_loss"]) < first_sem
    assert "mask_loss" in metrics  # the instance branch still trains


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "panoptic_tiny", "--steps", "2", "--no-mesh",
    ])
    out = capsys.readouterr().out
    assert "semantic_loss" in out and "mask_loss" in out

    summary = eval_cli.main([
        "--preset", "panoptic_tiny", "--max-images", "4",
        "--batch-size", "2", "--no-mesh",
    ])
    assert {"panoptic/PQ", "panoptic/SQ", "panoptic/RQ",
            "panoptic/semantic_mIoU", "segm/mAP"} <= set(summary)


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_panoptic_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "pan.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "panoptic_fpn"

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
    assert got["semantic"].shape == (1, 32, 32)
    np.testing.assert_array_equal(got["semantic"], want["semantic"])


def test_coco_panoptic_dataset(tmp_path):
    """panoptic_{split}.json + PNG id maps (id = R + 256G + 65536B) parse
    into detection GT for things and an original-resolution semantic map
    (stuff 1..S, things S+class, void 0)."""
    import json
    from PIL import Image

    from tpudet.data import build_dataset
    from tpudet.data.coco_panoptic import CocoPanopticDataset

    root = tmp_path
    (root / "annotations" / "panoptic_val2017").mkdir(parents=True)
    (root / "val2017").mkdir()
    Image.new("RGB", (32, 24)).save(root / "val2017" / "img1.jpg")
    # Segment ids: 300 (stuff, fills background), 77 (thing), 0 void strip.
    ids = np.full((24, 32), 300, np.uint32)
    ids[4:12, 8:20] = 77
    ids[:, 30:] = 0  # void strip
    png = np.stack([ids % 256, (ids // 256) % 256, ids // 65536],
                   axis=-1).astype(np.uint8)
    Image.fromarray(png).save(
        root / "annotations" / "panoptic_val2017" / "img1.png")
    blob = {
        "images": [{"id": 9, "file_name": "img1.jpg",
                    "height": 24, "width": 32}],
        "categories": [
            {"id": 1, "name": "person", "isthing": 1},
            {"id": 200, "name": "sky", "isthing": 0},
        ],
        "annotations": [{
            "image_id": 9, "file_name": "img1.png",
            "segments_info": [
                {"id": 77, "category_id": 1, "iscrowd": 0,
                 "bbox": [8, 4, 12, 8], "area": 96},
                {"id": 300, "category_id": 200, "iscrowd": 0,
                 "bbox": [0, 0, 32, 24], "area": 768 - 96},
            ],
        }],
    }
    with open(root / "annotations" / "panoptic_val2017.json", "w") as f:
        json.dump(blob, f)

    ds = CocoPanopticDataset(str(root), split="val")
    assert ds.num_classes == 1 and ds.num_stuff_classes == 1
    ex = ds.get_example(0)
    np.testing.assert_allclose(ex["boxes"], [[8, 4, 20, 12]])
    assert ex["classes"].tolist() == [1]
    sem = ex["semantic"]
    assert sem[0, 0] == 1          # stuff label 1
    assert sem[8, 10] == 2         # thing pixels: S + class = 2
    assert (sem[:, 30:] == 0).all()  # void strip preserved
    assert ex["masks"][0][8, 10] == 1 and ex["masks"][0][0, 0] == 0

    # The factory routes coco + load_semantic here and validates S.
    import dataclasses

    from tpudet.config import Config, DataConfig

    cfg = Config(data=DataConfig(
        dataset="coco", data_dir=str(root), num_classes=1,
        load_masks=True, load_semantic=True, num_stuff_classes=1,
    ))
    assert isinstance(build_dataset(cfg, "val"), CocoPanopticDataset)
    bad = cfg.replace(data=dataclasses.replace(
        cfg.data, num_stuff_classes=5))
    with pytest.raises(ValueError, match="stuff"):
        build_dataset(bad, "val")
