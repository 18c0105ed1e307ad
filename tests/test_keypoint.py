"""Keypoint R-CNN family tests (per-RoI heatmap pose estimation;
arXiv:1703.06870 §5): target arithmetic against hand scenes, loss
closed-forms, OKS evaluator hand-checks, flip consistency, training signal,
CLI and serving round-trips."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_keypoint_config
from tpudet.models import KeypointRCNN, build_model
from tpudet.train.losses import keypoint_loss


def make_batch(cfg, batch_size=2, seed=0, training=False):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=cfg.data.canvas_height, seed=seed, with_keypoints=True,
    )
    raw = next(iter(DataLoader(cfg, ds, batch_size, shuffle=False).batches(0)))
    return device_preprocess(
        cfg, {k: jnp.asarray(v) for k, v in raw.items()},
        jax.random.key(7) if training else None, training=training,
    )


def test_build_model_factory_and_validation():
    cfg = tiny_keypoint_config()
    assert isinstance(build_model(cfg), KeypointRCNN)
    with pytest.raises(ValueError, match="rpn_only"):
        KeypointRCNN(cfg.replace(rpn_only=True))
    with pytest.raises(ValueError, match="flip_pairs"):
        KeypointRCNN(cfg.replace(data=dataclasses.replace(
            cfg.data, keypoint_flip_pairs=((1, 9),))))


def test_keypoint_targets_hand_math():
    """Grid index arithmetic: keypoint at canvas (x, y) inside RoI
    [x1, y1, x2, y2] lands at cell (floor((x-x1)/w*S), floor(...)); labeled
    outside-RoI and v=0 keypoints are invalid."""
    cfg = tiny_keypoint_config()
    m = KeypointRCNN(cfg)
    s = m._heatmap_size  # 4 * 7 = 28
    rois = jnp.array([[0.0, 0.0, 56.0, 56.0]])
    gt_kps = jnp.array([[
        [2.0, 4.0, 2.0],     # cell (1, 2) -> idx 2*S + 1
        [55.9, 55.9, 2.0],   # last cell -> idx S*S - 1
        [60.0, 10.0, 2.0],   # outside the RoI -> invalid
        [10.0, 10.0, 0.0],   # unlabeled -> invalid
        [0.0, 0.0, 1.0],     # labeled-invisible still trains (v > 0)
    ]])
    idx, valid = m._keypoint_targets_single(
        rois, gt_kps, jnp.zeros((1,), jnp.int32)
    )
    assert s == 28
    np.testing.assert_array_equal(
        np.asarray(valid)[0], [True, True, False, False, True])
    assert int(idx[0, 0]) == 2 * s + 1
    assert int(idx[0, 1]) == s * s - 1
    assert int(idx[0, 4]) == 0


def test_keypoint_loss_closed_form():
    r, s, k = 2, 4, 3
    tgt_idx = jnp.zeros((r, k), jnp.int32).at[0, 0].set(5)
    tgt_valid = jnp.array([[True, True, False], [True, False, False]])
    fg_valid = jnp.array([True, False])  # row 1 excluded entirely
    # Uniform logits: CE = ln(S^2) for every counted keypoint (2 of them).
    uniform = jnp.zeros((r, s, s, k))
    got = keypoint_loss(uniform, tgt_idx, tgt_valid, fg_valid)
    assert float(got) == pytest.approx(math.log(s * s), rel=1e-6)
    # Near-one-hot logits at the target cells: loss ~ 0.
    hot = jnp.full((r, s * s, k), -20.0)
    hot = hot.at[0, 5, 0].set(20.0).at[0, 0, 1].set(20.0)
    got = keypoint_loss(hot.reshape(r, s, s, k), tgt_idx, tgt_valid, fg_valid)
    assert float(got) < 1e-6
    # Zero visible -> exactly 0 (no NaN).
    got = keypoint_loss(uniform, tgt_idx, jnp.zeros_like(tgt_valid),
                        fg_valid)
    assert float(got) == 0.0


def test_oks_matrix_hand_values():
    from tpudet.eval.metrics import _oks_matrix

    sigmas = (0.1, 0.1)
    gt = np.array([[[10.0, 10.0, 2.0], [20.0, 20.0, 2.0]]])
    gt_box = np.array([[5.0, 5.0, 25.0, 25.0]])
    area = np.array([100.0])
    # Exact match -> OKS 1.
    np.testing.assert_allclose(
        _oks_matrix(gt.copy(), gt, gt_box, area, sigmas), [[1.0]], atol=1e-9)
    # One keypoint offset by d=2: mean(1, exp(-4 / (2*area*(2*0.1)^2))).
    pred = gt.copy()
    pred[0, 1, 0] += 2.0
    want = 0.5 * (1.0 + math.exp(-4.0 / (2.0 * 100.0 * 0.04)))
    np.testing.assert_allclose(
        _oks_matrix(pred, gt, gt_box, area, sigmas), [[want]], rtol=1e-9)
    # GT with NO labeled keypoints: pycocotools' fallback scores detection
    # keypoints by their distance OUTSIDE the 2x-expanded GT box — inside
    # it, pseudo-OKS is 1 (so detections over ignore regions can
    # match-ignore); far away it decays toward 0.
    gt0 = gt.copy()
    gt0[0, :, 2] = 0.0
    np.testing.assert_allclose(
        _oks_matrix(pred, gt0, gt_box, area, sigmas), [[1.0]], atol=1e-9)
    far = pred.copy()
    far[0, :, :2] += 500.0
    assert float(_oks_matrix(far, gt0, gt_box, area, sigmas)[0, 0]) < 1e-6


def test_keypoint_evaluator_perfect_and_ignore():
    from tpudet.eval.metrics import CocoStyleEvaluator

    ev = CocoStyleEvaluator(1, iou_type="keypoints",
                            keypoint_sigmas=(0.1, 0.1))
    boxes = np.array([[0.0, 0.0, 50.0, 50.0]])
    kps = np.array([[[10.0, 10.0, 2.0], [30.0, 30.0, 2.0]]])
    # Perfect keypoints on the only GT -> mAP 1; a second GT with zero
    # labeled keypoints is an ignore region (doesn't count as a miss).
    gt_boxes = np.vstack([boxes, [[60.0, 60.0, 90.0, 90.0]]])
    gt_kps = np.vstack([kps, np.zeros((1, 2, 3))])
    ev.add_image(boxes, np.array([0.9]), np.array([1]),
                 gt_boxes, np.array([1, 1]),
                 pred_keypoints=kps, gt_keypoints=gt_kps)
    s = ev.summarize()
    assert s["mAP@0.5"] == pytest.approx(1.0)
    assert s["mAP"] == pytest.approx(1.0)
    # Missing the sigmas fails fast.
    with pytest.raises(ValueError, match="keypoint_sigmas"):
        CocoStyleEvaluator(1, iou_type="keypoints")


def test_keypoint_flip_consistency():
    """Flipping the image flips keypoint x and swaps the left/right pair —
    the flipped keypoints must be exactly the keypoints of the flipped
    boxes' geometry."""
    from tpudet.data.preprocess import device_preprocess
    from tpudet.ops.boxes import flip_boxes_horizontal

    cfg = tiny_keypoint_config()
    batch = make_batch(cfg, batch_size=4)
    # Force every image to flip: run the flip path many times until both
    # outcomes observed would be flaky — instead flip manually and compare.
    gk = np.asarray(batch["gt_keypoints"])
    gb = np.asarray(batch["gt_boxes"])
    hw = np.asarray(batch["image_hw"])
    out = device_preprocess(cfg, dict(batch), jax.random.key(0),
                            training=True)
    ob = np.asarray(out["gt_boxes"])
    ok = np.asarray(out["gt_keypoints"])
    for i in range(4):
        flipped = not np.allclose(ob[i], gb[i])
        want_b = (np.asarray(flip_boxes_horizontal(
            jnp.asarray(gb[i]), hw[i][1])) if flipped else gb[i])
        np.testing.assert_allclose(ob[i], want_b, atol=1e-4)
        if flipped:
            w = hw[i][1]
            # center keypoint (index 0): x mirrors; pair (1, 2) swaps.
            valid = gk[i, :, 0, 2] > 0
            np.testing.assert_allclose(
                ok[i, valid, 0, 0], w - gk[i, valid, 0, 0], atol=1e-4)
            np.testing.assert_allclose(
                ok[i, valid, 1, 0], w - gk[i, valid, 2, 0], atol=1e-4)
            np.testing.assert_allclose(
                ok[i, valid, 2, 0], w - gk[i, valid, 1, 0], atol=1e-4)
        else:
            np.testing.assert_allclose(ok[i], gk[i], atol=1e-4)


@pytest.mark.slow
def test_loss_decreases_and_trains():
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_keypoint_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, learning_rate=0.02, warmup_steps=0, batch_size=2,
    ))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = make_batch(cfg)
    first_kp = first = None
    for _ in range(20):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
            first_kp = float(metrics["keypoint_loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first
    assert float(metrics["keypoint_loss"]) < first_kp
    # The keypoint CE starts near ln(S²) (uniform heatmap), NOT summed into
    # the total more than once (regression for the _extra_losses contract).
    s = 4 * cfg.keypoint.roi_output_size
    assert first_kp < 1.5 * math.log(s * s)


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "keypoint_tiny", "--dataset", "synthetic",
        "--steps", "2", "--no-mesh",
    ])
    out = capsys.readouterr().out
    assert "keypoint_loss" in out

    summary = eval_cli.main([
        "--preset", "keypoint_tiny", "--dataset", "synthetic",
        "--max-images", "4", "--no-mesh",
    ])
    assert "mAP" in summary and "kp/mAP" in summary


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_keypoint_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "kp.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "keypoint_rcnn"

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
    assert got["keypoints"].shape == (1, cfg.roi.max_detections,
                                      cfg.data.num_keypoints, 3)
    np.testing.assert_allclose(got["keypoints"], want["keypoints"],
                               atol=1e-4)
