"""RetinaNet family tests (single-stage detector built from the framework's
shared components; arXiv:1708.02002). Mirrors the Faster R-CNN test strategy:
geometry against hand-built scenes, loss semantics against the paper's
normalization rules, short-horizon training signal, CLI smoke."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_retinanet_config
from tpudet.models import RetinaNet, build_model
from tpudet.ops import boxes as box_ops
from tpudet.train.losses import retinanet_losses


def make_batch(cfg, batch_size=2, seed=0):
    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess

    ds = SyntheticDataset(
        num_classes=cfg.data.num_classes, num_examples=batch_size,
        image_size=cfg.data.canvas_height, seed=seed,
    )
    raw = next(iter(DataLoader(cfg, ds, batch_size, shuffle=False).batches(0)))
    return device_preprocess(cfg, {k: jnp.asarray(v) for k, v in raw.items()})


def test_build_model_factory():
    cfg = tiny_retinanet_config()
    assert isinstance(build_model(cfg), RetinaNet)
    with pytest.raises(ValueError, match="unknown model"):
        build_model(cfg.replace(model="yolo"))
    # Two-stage-only training modes are rejected up front.
    with pytest.raises(ValueError, match="rpn_only"):
        RetinaNet(cfg.replace(rpn_only=True))
    with pytest.raises(ValueError, match="use_fpn"):
        RetinaNet(cfg.replace(
            backbone=dataclasses.replace(cfg.backbone, use_fpn=False)
        ))


def test_anchor_head_alignment():
    """The concatenated head rows must align 1:1 with the anchor constant:
    same total count, per-level counts matching the ceil-grid rule, and the
    sub-octave anchors actually present per cell."""
    cfg = tiny_retinanet_config()
    m = RetinaNet(cfg)
    anchors = np.asarray(m.anchor_boxes())
    sizes = m.anchor_level_sizes()
    assert anchors.shape[0] == sum(sizes)
    a = cfg.anchors
    per_cell = len(a.fpn_octave_scales) * len(a.aspect_ratios)
    assert a.num_fpn_anchors_per_cell == per_cell
    h = w = cfg.data.canvas_height
    for n, s in zip(sizes, a.fpn_strides):
        assert n == (-(-h // s)) * (-(-w // s)) * per_cell
    # Head output length matches (the alignment everything else rests on).
    v = m.init(jax.random.key(0))
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    feats = m.core.apply(v, img, method=type(m.core).features)
    logits, deltas = m.core.apply(v, feats, method=type(m.core).heads)
    assert logits.shape == (1, anchors.shape[0], cfg.data.num_classes)
    assert deltas.shape == (1, anchors.shape[0], 4)
    # Octave scales really differ within a cell: the first two same-ratio
    # anchors of the first cell have areas in ratio ~1.26^2.
    first = anchors[:per_cell]
    area = (first[:, 2] - first[:, 0]) * (first[:, 3] - first[:, 1])
    np.testing.assert_allclose(area[3] / area[0], 1.26 ** 2, rtol=1e-5)


def test_focal_loss_semantics():
    """Paper Eq. 4-5 normalization: ignored anchors drop out entirely, the
    box term covers positives only, and a zero-positive image stays finite
    (normalizer clamps to 1)."""
    n, c = 8, 3
    logits = jnp.zeros((n, c))
    deltas = jnp.zeros((n, 4))
    tgt_deltas = jnp.ones((n, 4))
    tgt_classes = jnp.array([1, 2, 0, 0, 0, 0, 0, 0], jnp.int32)
    labels = jnp.array([1, 1, 0, 0, -1, -1, 0, 0], jnp.int32)
    cls_loss, box_loss = retinanet_losses(
        logits, deltas, tgt_classes, tgt_deltas, labels,
        alpha=0.25, gamma=2.0, beta=0.0,
    )
    # Hand expectation: zero logits -> p = p_t = 0.5 everywhere, so each
    # element contributes alpha_t * (1-p_t)^gamma * BCE = alpha_t * 0.25 *
    # ln 2. Six used anchors (two ignored) x 3 classes = 18 elements: 2 are
    # targets (alpha_t = 0.25), 16 are non-targets (alpha_t = 0.75);
    # normalized by the 2 positives.
    import math

    expect = (2 * 0.25 + 16 * 0.75) * 0.25 * math.log(2) / 2
    assert float(cls_loss) == pytest.approx(expect, rel=1e-5)
    # Box: |0-1| summed over 4 coords on the 2 positives / 2 positives.
    assert float(box_loss) == pytest.approx(4.0, rel=1e-6)

    # Zero positives: cls covers negatives only, box is exactly 0, no NaN.
    labels0 = jnp.zeros((n,), jnp.int32)
    cls0, box0 = retinanet_losses(
        logits, deltas, jnp.zeros((n,), jnp.int32), tgt_deltas, labels0,
    )
    assert np.isfinite(float(cls0)) and float(box0) == 0.0


def test_predict_recovers_planted_box():
    """Craft head outputs that encode one GT box at its best anchor: the
    full postprocess (per-level top-k -> sigmoid -> decode -> clip ->
    class-aware NMS) must return exactly that box with its class."""
    cfg = tiny_retinanet_config()
    m = RetinaNet(cfg)
    anchors = m.anchor_boxes()
    sizes = m.anchor_level_sizes()
    n = anchors.shape[0]
    c = cfg.data.num_classes
    gt = jnp.array([40.0, 32.0, 88.0, 80.0])  # 48x48 box
    iou = box_ops.pairwise_iou(anchors, gt[None, :])[:, 0]
    best = int(jnp.argmax(iou))
    cls_logits = jnp.full((n, c), -10.0).at[best, 1].set(8.0)  # class 2
    deltas = jnp.zeros((n, 4)).at[best].set(
        box_ops.encode_boxes(gt, anchors[best],
                             cfg.retinanet.box_reg_weights)
    )
    image_hw = jnp.array([128.0, 128.0])
    boxes, scores, classes, valid = m._predict_single(
        anchors, sizes, cls_logits, deltas, image_hw
    )
    assert bool(valid[0]) and int(jnp.sum(valid)) == 1
    assert int(classes[0]) == 2
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(gt), atol=1e-3)
    assert float(scores[0]) > 0.99


def test_prefilter_matches_exact_selection():
    """The class-max prefilter (RetinaNetConfig.prefilter — the fix for the
    82.65 img/s/chip flattened-selection pathology, KERNELS.md) must yield
    the SAME candidates as the paper-exact flattened top-k whenever the
    containment property holds: on continuous random logits the selected
    (value, anchor, class) triples are identical, so every downstream array
    (decode, clip, NMS) is bit-identical. P3 here has 1536 anchors vs
    pre_nms_topk=64, so the prefilter branch genuinely runs."""
    cfg = tiny_retinanet_config()
    m = RetinaNet(cfg)
    anchors = m.anchor_boxes()
    sizes = m.anchor_level_sizes()
    assert sizes[0] > cfg.retinanet.pre_nms_topk  # branch actually taken
    n = anchors.shape[0]
    c = cfg.data.num_classes
    rng = np.random.RandomState(7)
    cls_logits = jnp.asarray(rng.randn(n, c).astype(np.float32))
    deltas = jnp.asarray(0.1 * rng.randn(n, 4).astype(np.float32))
    image_hw = jnp.array([128.0, 128.0])

    outs = {}
    for mode in ("on", "off"):
        mm = RetinaNet(cfg.replace(
            retinanet=dataclasses.replace(cfg.retinanet, prefilter=mode)
        ))
        outs[mode] = mm._predict_single(
            anchors, sizes, cls_logits, deltas, image_hw
        )
    for a, b, name in zip(outs["on"], outs["off"],
                          ("boxes", "scores", "classes", "valid")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_eval_referee_pins_prefilter_off():
    """The parity referee runs the paper-exact selection: 'auto' is pinned
    to 'off' by the eval CLI's referee_config; an explicit 'on' survives
    (the opt-in for throughput-oriented eval)."""
    from tpudet.cli.eval import referee_config

    cfg = tiny_retinanet_config()
    assert cfg.retinanet.prefilter == "auto"  # default is the fast path
    assert referee_config(cfg).retinanet.prefilter == "off"
    pinned_on = referee_config(cfg.replace(
        retinanet=dataclasses.replace(cfg.retinanet, prefilter="on")
    ))
    assert pinned_on.retinanet.prefilter == "on"


@pytest.mark.slow
def test_loss_decreases_and_trains():
    """Short-horizon training signal through the shared trainer: total loss
    drops on a fixed batch, and the prior-prob bias keeps step-0 focal loss
    at the positive-term floor (not the divergent all-anchor sum)."""
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_retinanet_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, learning_rate=0.02, warmup_steps=0,
    ))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    batch = make_batch(cfg)
    first = None
    for _ in range(15):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and first < 10.0  # prior-prob init sanity
    assert last < 0.8 * first, (first, last)


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    """The new family composes with the shared mesh machinery: 8 fake CPU
    devices, batch sharded on 'data', params replicated, XLA grad psum."""
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_retinanet_config()
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
    assert int(state.step) == 1
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_train_and_eval_cli_smoke(capsys):
    from tpudet.cli import eval as eval_cli
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "retinanet_tiny", "--dataset", "synthetic",
        "--steps", "2", "--no-mesh",
    ])
    out = capsys.readouterr().out
    assert "focal_cls_loss" in out

    summary = eval_cli.main([
        "--preset", "retinanet_tiny", "--dataset", "synthetic",
        "--max-images", "4", "--no-mesh",
    ])
    assert "mAP" in summary
    # proposal-recall is a two-stage analysis; fail fast for retinanet.
    with pytest.raises(SystemExit, match="proposal"):
        eval_cli.main([
            "--preset", "retinanet_tiny", "--dataset", "synthetic",
            "--metric", "proposal-recall", "--max-images", "2", "--no-mesh",
        ])


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    """The model-agnostic serving path: export a RetinaNet artifact, load it
    in a fresh ServingModel, match the in-process predict."""
    from tpudet.serving import ServingModel, save_artifact

    cfg = tiny_retinanet_config().replace(use_pallas=False)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0))
    path = tmp_path / "retinanet.tpudet"
    meta = save_artifact(str(path), cfg, variables, batch_size=1)
    assert meta["model"] == "retinanet"
    assert meta["max_detections"] == cfg.retinanet.max_detections

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
