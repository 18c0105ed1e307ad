"""DETR family tests (transformer set-prediction detector built from the
framework's shared components; arXiv:2005.12872). Mirrors the FCOS test
strategy: the matcher against a scipy oracle, loss semantics against closed
forms, geometry against hand-built scenes, short-horizon training signal,
CLI + serving smoke."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_detr_config
from tpudet.models import DETR, build_model
from tpudet.models.detr import sine_position_embedding
from tpudet.ops import boxes as box_ops
from tpudet.ops.hungarian import hungarian
from tpudet.train.losses import detr_set_loss


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
    cfg = tiny_detr_config()
    assert isinstance(build_model(cfg), DETR)
    with pytest.raises(ValueError, match="rpn_only"):
        DETR(cfg.replace(rpn_only=True))
    with pytest.raises(ValueError, match="use_fpn"):
        DETR(cfg.replace(
            backbone=dataclasses.replace(cfg.backbone, use_fpn=True)
        ))
    with pytest.raises(ValueError, match="divisible by 4"):
        DETR(cfg.replace(detr=dataclasses.replace(cfg.detr, d_model=30)))
    with pytest.raises(ValueError, match="num_heads"):
        DETR(cfg.replace(detr=dataclasses.replace(cfg.detr, num_heads=3)))
    with pytest.raises(ValueError, match="num_queries"):
        DETR(cfg.replace(detr=dataclasses.replace(cfg.detr, num_queries=4)))


def test_hungarian_vs_scipy_fuzz():
    """Exact optimality vs scipy's linear_sum_assignment: random matrices,
    heavy integer ties, rectangular shapes; assignments must be injective
    and total costs must agree exactly."""
    from scipy.optimize import linear_sum_assignment

    solve = jax.jit(hungarian)
    rng = np.random.RandomState(0)
    for trial in range(60):
        r = rng.randint(1, 10)
        c = rng.randint(r, 14)
        if trial % 3 == 0:
            cost = rng.randint(0, 4, (r, c)).astype(np.float32)
        else:
            cost = (rng.randn(r, c) * 10).astype(np.float32)
        col = np.asarray(solve(jnp.asarray(cost)))
        assert len(set(col.tolist())) == r
        ri, ci = linear_sum_assignment(cost)
        got = cost[np.arange(r), col].sum()
        want = cost[ri, ci].sum()
        assert got == pytest.approx(want, abs=1e-3), trial


def test_hungarian_greedy_trap_and_padded_rows():
    """[[1, 2], [1, 10]]: greedy row order picks (0,0),(1,1) = 11; the
    optimal crossing (0,1),(1,0) = 3. And constant-cost padding rows must
    not perturb the valid rows' optimal matches."""
    col = np.asarray(hungarian(jnp.array([[1.0, 2.0], [1.0, 10.0]])))
    np.testing.assert_array_equal(col, [1, 0])

    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(1)
    for _ in range(20):
        valid = rng.randint(1, 8)
        cost = np.zeros((10, 12), np.float32)
        cost[:valid] = rng.randn(valid, 12) * 5
        col = np.asarray(hungarian(jnp.asarray(cost)))
        assert len(set(col.tolist())) == 10
        ri, ci = linear_sum_assignment(cost[:valid])
        got = cost[np.arange(valid), col[:valid]].sum()
        assert got == pytest.approx(cost[ri, ci].sum(), abs=1e-3)

    with pytest.raises(ValueError, match="rows <= cols"):
        hungarian(jnp.zeros((3, 2)))


def test_hungarian_masked_vs_scipy_fuzz():
    """hungarian_masked: optimal over the VALID rows only (scattered
    anywhere in the matrix, not just a prefix), sentinel C for invalid
    rows, injective among valid matches — total cost equals scipy on the
    valid sub-matrix. Also: zero-valid and all-valid edge cases, and the
    while_loop trip count must not depend on padding (vmap lockstep)."""
    from scipy.optimize import linear_sum_assignment

    from tpudet.ops.hungarian import hungarian_masked

    solve = jax.jit(hungarian_masked)
    rng = np.random.RandomState(2)
    for trial in range(40):
        r = rng.randint(1, 12)
        c = rng.randint(r, 15)
        if trial % 3 == 0:
            cost = rng.randint(0, 4, (r, c)).astype(np.float32)
        else:
            cost = (rng.randn(r, c) * 10).astype(np.float32)
        valid = rng.rand(r) < 0.6
        col = np.asarray(solve(jnp.asarray(cost), jnp.asarray(valid)))
        assert (col[~valid] == c).all()
        vcols = col[valid]
        assert len(set(vcols.tolist())) == valid.sum()
        if valid.any():
            sub = cost[valid]
            ri, ci = linear_sum_assignment(sub)
            got = sub[np.arange(valid.sum()), vcols].sum()
            assert got == pytest.approx(sub[ri, ci].sum(), abs=1e-3), trial

    # all-valid == plain hungarian total cost
    cost = (np.random.RandomState(3).randn(8, 10) * 5).astype(np.float32)
    col_m = np.asarray(solve(jnp.asarray(cost), jnp.ones(8, bool)))
    col_p = np.asarray(hungarian(jnp.asarray(cost)))
    assert cost[np.arange(8), col_m].sum() == pytest.approx(
        cost[np.arange(8), col_p].sum(), abs=1e-3
    )
    # zero-valid: all sentinel
    col0 = np.asarray(solve(jnp.asarray(cost), jnp.zeros(8, bool)))
    assert (col0 == 10).all()

    # vmapped (the set-loss usage): lockstep across a batch of masks
    costs = np.random.RandomState(4).randn(5, 7, 9).astype(np.float32) * 3
    valids = np.random.RandomState(5).rand(5, 7) < 0.5
    cols = np.asarray(jax.jit(jax.vmap(hungarian_masked))(
        jnp.asarray(costs), jnp.asarray(valids)))
    for b in range(5):
        v = valids[b]
        assert (cols[b][~v] == 9).all()
        if v.any():
            sub = costs[b][v]
            ri, ci = linear_sum_assignment(sub)
            got = sub[np.arange(v.sum()), cols[b][v]].sum()
            assert got == pytest.approx(sub[ri, ci].sum(), abs=1e-3)


def test_sine_embedding_padding_invariance():
    """The embedding over the VALID region must be identical no matter how
    much canvas padding surrounds it (the mask-cumsum normalization keys on
    the true extent) — this is what makes detection geometry independent of
    the aspect bucket the batch landed in."""
    d = 32
    small = np.zeros((8, 8), bool)
    small[:5, :6] = True
    big = np.zeros((12, 10), bool)
    big[:5, :6] = True
    e_small = np.asarray(sine_position_embedding(jnp.asarray(small), d))
    e_big = np.asarray(sine_position_embedding(jnp.asarray(big), d))
    np.testing.assert_allclose(
        e_small[:5, :6], e_big[:5, :6], atol=1e-6
    )
    assert e_small.shape == (8, 8, d)
    # Distinct positions get distinct embeddings.
    flat = e_small[:5, :6].reshape(-1, d)
    assert len({tuple(np.round(r, 5)) for r in flat}) == 30


def test_set_loss_closed_form():
    """Uniform logits + perfect boxes: CE is log(3) per query with weight 1
    on the single matched query and eos_coef elsewhere; box sums are zero;
    padded GT rows change nothing."""
    q, g = 4, 3
    logits = jnp.zeros((q, 3))  # C=2 -> 3 columns with no-object
    gt_box = jnp.array([0.5, 0.5, 0.25, 0.25])
    pred = jnp.tile(gt_box, (q, 1))
    gt_boxes = jnp.tile(gt_box, (g, 1))
    gt_classes = jnp.array([1, 2, 2], jnp.int32)
    gt_valid = jnp.array([True, False, False])

    ce_s, ce_w, l1_s, gi_s, npos = detr_set_loss(
        logits, pred, gt_boxes, gt_classes, gt_valid,
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0, eos_coef=0.1,
    )
    assert float(ce_w) == pytest.approx(1.0 + 0.1 * 3)
    assert float(ce_s) == pytest.approx(math.log(3) * (1.0 + 0.1 * 3),
                                        rel=1e-5)
    assert float(l1_s) == pytest.approx(0.0, abs=1e-6)
    assert float(gi_s) == pytest.approx(0.0, abs=1e-6)
    assert float(npos) == 1.0

    # Shift every predicted box: l1 = 0.1, giou = 1 - 3/7 (hull == union).
    ce2, _, l1_2, gi_2, _ = detr_set_loss(
        logits, pred.at[:, 0].add(0.1), gt_boxes, gt_classes, gt_valid,
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0, eos_coef=0.1,
    )
    assert float(ce2) == pytest.approx(float(ce_s), rel=1e-5)
    assert float(l1_2) == pytest.approx(0.1, rel=1e-5)
    assert float(gi_2) == pytest.approx(1.0 - 3.0 / 7.0, rel=1e-4)

    # Zero valid GT: every query is a no-object target, box sums zero.
    ce0, cw0, l10, gi0, np0 = detr_set_loss(
        logits, pred, gt_boxes, gt_classes, jnp.zeros((g,), bool),
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0, eos_coef=0.1,
    )
    assert float(np0) == 0.0 and float(l10) == 0.0 and float(gi0) == 0.0
    assert float(cw0) == pytest.approx(0.4)
    assert float(ce0) == pytest.approx(math.log(3) * 0.4, rel=1e-5)


def test_set_loss_prefers_confident_query():
    """Two queries, one GT: the query already predicting the GT's class
    must win the matching (class cost), so its CE carries weight 1 and the
    other query trains toward no-object."""
    # Query 1 confident in class 2; query 0 confident no-object.
    logits = jnp.array([[5.0, -5.0, -5.0], [-5.0, -5.0, 5.0]])
    gt_box = jnp.array([0.5, 0.5, 0.2, 0.2])
    pred = jnp.tile(gt_box, (2, 1))
    ce_s, _, _, _, _ = detr_set_loss(
        logits, pred, gt_box[None], jnp.array([2], jnp.int32),
        jnp.array([True]),
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0, eos_coef=0.1,
    )
    # Matched query 1 has CE ~ 0 (confident, correct); query 0's no-object
    # CE ~ 0 too -> tiny total. A wrong match would cost ~10 nats.
    assert float(ce_s) < 0.01


def test_e2e_canvas_invariance():
    """END-TO-END bucket invariance: the same image + GT placed on two
    different canvases must produce identical losses AND identical decoded
    predictions. The pieces: padded tokens are masked as attention keys,
    the sine embedding normalizes over the valid extent, boxes are
    normalized/decoded by the TRUE image extent (not the canvas), and a
    frozen-BN backbone is positionally local. GN would fold padding pixels
    into its statistics, so the tiny config's backbone norm is swapped to
    frozen_bn here — with it, nothing in the pipeline can see the canvas."""
    base = tiny_detr_config()
    bb = dataclasses.replace(base.backbone, norm="frozen_bn")
    cfg_a = base.replace(backbone=bb)
    cfg_b = cfg_a.replace(data=dataclasses.replace(
        cfg_a.data, canvas_height=160, canvas_width=192
    ))

    rng = np.random.RandomState(0)
    img = rng.rand(96, 96, 3).astype(np.float32)
    g = cfg_a.data.max_gt_boxes

    def batch_for(cfg):
        h, w = cfg.data.canvas_height, cfg.data.canvas_width
        canvas = np.zeros((1, h, w, 3), np.float32)
        canvas[0, :96, :96] = img
        gt = np.zeros((1, g, 4), np.float32)
        gt[0, 0] = [10.0, 20.0, 60.0, 80.0]
        gt[0, 1] = [30.0, 5.0, 90.0, 50.0]
        cls = np.zeros((1, g), np.int32)
        cls[0, :2] = [1, 2]
        valid = np.zeros((1, g), bool)
        valid[0, :2] = True
        return {
            "image": jnp.asarray(canvas),
            "image_hw": jnp.asarray([[96.0, 96.0]]),
            "gt_boxes": jnp.asarray(gt),
            "gt_classes": jnp.asarray(cls),
            "gt_valid": jnp.asarray(valid),
        }

    m_a, m_b = DETR(cfg_a), DETR(cfg_b)
    v = m_a.init(jax.random.key(0))  # param shapes are canvas-independent

    loss_a, met_a = m_a.loss(v, batch_for(cfg_a), jax.random.key(1))
    loss_b, met_b = m_b.loss(v, batch_for(cfg_b), jax.random.key(1))
    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-4)

    out_a = m_a.predict(v, batch_for(cfg_a))
    out_b = m_b.predict(v, batch_for(cfg_b))
    np.testing.assert_allclose(
        np.asarray(out_a["boxes"]), np.asarray(out_b["boxes"]),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["scores"]), np.asarray(out_b["scores"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["classes"]), np.asarray(out_b["classes"])
    )


def test_predict_recovers_planted_box():
    """Craft decoder outputs that encode one box at one query: the
    postprocess (top-k over (query, class) posteriors, cxcywh decode, clip)
    must return exactly that box with its class and nothing else valid."""
    cfg = tiny_detr_config()
    m = DETR(cfg)
    q, c = cfg.detr.num_queries, cfg.data.num_classes
    logits = jnp.full((q, c + 1), -8.0).at[:, 0].set(8.0)
    logits = logits.at[7, 0].set(-8.0).at[7, 2].set(8.0)  # class 2
    gt = np.array([32.0, 32.0, 64.0, 64.0])
    boxes_n = jnp.tile(jnp.array([0.9, 0.9, 0.05, 0.05]), (q, 1)).at[7].set(
        jnp.array([48 / 128, 48 / 128, 32 / 128, 32 / 128])
    )
    boxes, scores, classes, valid = m._predict_single(
        logits, boxes_n, jnp.array([128.0, 128.0])
    )
    assert bool(valid[0]) and int(jnp.sum(valid)) == 1
    assert int(classes[0]) == 2
    np.testing.assert_allclose(np.asarray(boxes[0]), gt, atol=1e-3)
    assert float(scores[0]) > 0.99


def test_loss_and_predict_shapes():
    cfg = tiny_detr_config()
    m = build_model(cfg)
    v = m.init(jax.random.key(0))
    batch = make_batch(cfg)
    loss, metrics = m.loss(v, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    for k in ("class_ce_loss", "l1_box_loss", "giou_box_loss",
              "num_gt"):
        assert np.isfinite(float(metrics[k])), k
    out = m.predict(v, batch)
    d = cfg.detr.max_detections
    assert out["boxes"].shape == (2, d, 4)
    assert out["scores"].shape == (2, d)
    assert out["classes"].shape == (2, d)
    # aux_loss off: total equals the single final-layer sum.
    m2 = build_model(cfg.replace(
        detr=dataclasses.replace(cfg.detr, aux_loss=False)
    ))
    loss2, met2 = m2.loss(v, batch, jax.random.key(1))
    want = (
        cfg.detr.loss_weight_class * met2["class_ce_loss"]
        + cfg.detr.loss_weight_bbox * met2["l1_box_loss"]
        + cfg.detr.loss_weight_giou * met2["giou_box_loss"]
    )
    assert float(loss2) == pytest.approx(float(want), rel=1e-5)


@pytest.mark.slow
def test_loss_decreases_and_trains():
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_detr_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, optimizer="adam", learning_rate=1e-3, warmup_steps=0,
        grad_clip_norm=0.1, weight_decay=1e-4,
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
    last = float(metrics["loss"])
    assert np.isfinite(first) and first < 30.0
    assert last < 0.6 * first, (first, last)


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_detr_config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=8))
    model = build_model(cfg)
    mesh = make_mesh(num_data=8)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg, mesh=mesh)
    batch = shard_batch(mesh, make_batch(cfg, batch_size=8))
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "detr_tiny", "--dataset", "synthetic",
        "--steps", "2", "--no-mesh",
    ])
    out = capsys.readouterr().out
    assert "l1_box_loss" in out and "giou_box_loss" in out

    summary = eval_cli.main([
        "--preset", "detr_tiny", "--dataset", "synthetic",
        "--max-images", "4", "--no-mesh",
    ])
    assert "mAP" in summary
    with pytest.raises(SystemExit, match="proposal"):
        eval_cli.main([
            "--preset", "detr_tiny", "--dataset", "synthetic",
            "--metric", "proposal-recall", "--max-images", "2", "--no-mesh",
        ])


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    from tpudet.data.preprocess import device_preprocess
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_detr_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "detr.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "detr"
    assert meta["max_detections"] == cfg.detr.max_detections
    assert meta["score_thresh"] == cfg.detr.score_thresh

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (1, 128, 128, 3), np.uint8)
    hw = np.array([[128.0, 128.0]], np.float32)
    got = jax.device_get(ServingModel.load(str(path))(image, hw))
    batch = device_preprocess(
        cfg, {"image": jnp.asarray(image), "image_hw": jnp.asarray(hw)},
        training=False,
    )
    want = jax.device_get(model.predict(variables, batch))
    np.testing.assert_array_equal(got["valid"], want["valid"])
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-4)
