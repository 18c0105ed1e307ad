"""Cascade R-CNN family tests (multi-stage refinement over the shared
two-stage machinery; arXiv:1712.00726): stage re-labeling semantics against
hand scenes, the detached box chain, training signal through the shared
trainer with per-stage metrics, TP sharding of every stage's head, CLI and
serving round-trips."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_cascade_config
from tpudet.models import CascadeRCNN, build_model
from tpudet.ops import boxes as box_ops


def make_batch(cfg, batch_size=2, seed=0):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=cfg.data.canvas_height, seed=seed,
    )
    raw = next(iter(DataLoader(cfg, ds, batch_size, shuffle=False).batches(0)))
    return device_preprocess(cfg, {k: jnp.asarray(v) for k, v in raw.items()})


def test_build_model_factory_and_validation():
    cfg = tiny_cascade_config()
    assert isinstance(build_model(cfg), CascadeRCNN)
    with pytest.raises(ValueError, match="class_agnostic"):
        CascadeRCNN(cfg.replace(
            roi=dataclasses.replace(cfg.roi, class_agnostic_bbox=False)
        ))
    with pytest.raises(ValueError, match=">= 2 stages"):
        CascadeRCNN(cfg.replace(cascade=dataclasses.replace(
            cfg.cascade, stage_iou_thresholds=(0.5,),
            stage_box_reg_weights=((10.0, 10.0, 5.0, 5.0),),
            stage_loss_weights=(1.0,),
        )))
    with pytest.raises(ValueError, match="disagree"):
        CascadeRCNN(cfg.replace(cascade=dataclasses.replace(
            cfg.cascade, stage_loss_weights=(1.0, 1.0),
        )))
    with pytest.raises(ValueError, match="non-decreasing"):
        CascadeRCNN(cfg.replace(cascade=dataclasses.replace(
            cfg.cascade, stage_iou_thresholds=(0.7, 0.6, 0.5),
        )))


def test_stage_relabeling_hand_scene():
    """Re-labeling the same RoI set at rising thresholds: a 0.55-IoU box is
    fg at stage 1's 0.5 but bg at 0.6/0.7; stage >= 2 has NO ignore band
    (everything kept gets a label); stage-1-invalid rows stay invalid."""
    cfg = tiny_cascade_config()
    m = CascadeRCNN(cfg)
    gt = jnp.zeros((cfg.data.max_gt_boxes, 4)).at[0].set(
        jnp.array([0.0, 0.0, 100.0, 100.0]))
    gt_cls = jnp.zeros((cfg.data.max_gt_boxes,), jnp.int32).at[0].set(2)
    gt_valid = jnp.zeros((cfg.data.max_gt_boxes,), bool).at[0].set(True)
    boxes = jnp.array([
        [0.0, 0.0, 100.0, 100.0],   # IoU 1.0 — fg at every stage
        [0.0, 0.0, 55.0, 100.0],    # IoU 0.55 — fg at 0.5, bg at 0.6/0.7
        [0.0, 0.0, 65.0, 100.0],    # IoU 0.65 — fg at 0.5/0.6, bg at 0.7
        [50.0, 50.0, 60.0, 60.0],   # IoU 0.01 — bg everywhere
    ])
    valid = jnp.array([True, True, True, False])

    w = jnp.asarray(cfg.cascade.stage_box_reg_weights[1])
    for thresh, want_fg in [(0.5, [1, 1, 1]), (0.6, [1, 0, 1]),
                            (0.7, [1, 0, 0])]:
        tgt_cls, tgt_deltas, is_fg, v = m._cascade_targets_single(
            thresh, w, boxes, valid, gt, gt_cls, gt_valid
        )
        np.testing.assert_array_equal(
            np.asarray(is_fg)[:3], np.asarray(want_fg, bool))
        assert not bool(is_fg[3]) and not bool(v[3])  # invalid stays out
        assert bool(v[:3].all())  # no ignore band among kept rows
        fg = np.asarray(is_fg)
        np.testing.assert_array_equal(
            np.asarray(tgt_cls)[:3], np.where(fg[:3], 2, 0))
    # Perfect box at stage weights: zero deltas.
    np.testing.assert_allclose(np.asarray(tgt_deltas)[0], 0.0, atol=1e-5)


def test_refine_boxes_detached_and_exact():
    """The box chain decodes each RoI's single delta set and clips; the
    stop_gradient means stage t's loss cannot reach stage t-1's deltas
    through the chain."""
    cfg = tiny_cascade_config()
    m = CascadeRCNN(cfg)
    boxes = jnp.array([[[10.0, 10.0, 50.0, 50.0]]])  # [B=1, K=1, 4]
    target = jnp.array([[[20.0, 16.0, 60.0, 56.0]]])
    w = cfg.cascade.stage_box_reg_weights[0]
    deltas = jax.vmap(
        lambda t, b: box_ops.encode_boxes(t, b, w)
    )(target, boxes)[:, :, None, :]  # [B, K, 1, 4]
    hw = jnp.array([[128.0, 128.0]])
    refined = m._refine_boxes(boxes, deltas, hw, w)
    np.testing.assert_allclose(
        np.asarray(refined), np.asarray(target), atol=1e-4)

    def through_chain(d):
        return jnp.sum(m._refine_boxes(boxes, d, hw, w))

    grad = jax.grad(through_chain)(deltas)
    np.testing.assert_array_equal(np.asarray(grad), 0.0)


@pytest.mark.slow
def test_loss_decreases_with_stage_metrics():
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_cascade_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, learning_rate=0.02, warmup_steps=0, batch_size=2,
    ))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = make_batch(cfg)
    first = None
    for _ in range(20):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
            assert {"det_cls_loss_s1", "det_cls_loss_s2", "det_cls_loss_s3",
                    "rpn_cls_loss"} <= set(metrics)
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first, (first, last)


@pytest.mark.slow
def test_tensor_parallel_all_stage_heads():
    """dp=4 x tp=2: every stage's MLP shards over 'model' (the det_head
    substring rule), and the step runs."""
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.parallel.sharding_rules import shard_train_state
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_cascade_config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=4))
    model = build_model(cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    state = shard_train_state(
        mesh, create_train_state(model, cfg.train, jax.random.key(0)))
    for head in ("det_head", "det_head2", "det_head3"):
        fc1 = state.params[head]["fc1"]["kernel"]
        assert not fc1.sharding.is_fully_replicated, head
    step = make_train_step(model, cfg, mesh=mesh, state_example=state)
    batch = shard_batch(mesh, make_batch(cfg, batch_size=4))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "cascade_tiny", "--dataset", "synthetic",
        "--steps", "2", "--no-mesh",
    ])
    out = capsys.readouterr().out
    assert "det_cls_loss_s3" in out

    summary = eval_cli.main([
        "--preset", "cascade_tiny", "--dataset", "synthetic",
        "--max-images", "4", "--no-mesh",
    ])
    assert "mAP" in summary


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_cascade_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "cascade.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "cascade_rcnn"

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
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)
