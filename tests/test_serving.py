"""AOT export / serving artifact tests (tpudet/serving/export.py).

The exported StableHLO program must produce the same detections as the live
jitted model, survive a serialize→zip→load round trip, and the ServingModel
host wrapper must return original-coordinate boxes for raw images.
"""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from tpudet.config import tiny_test_config
from tpudet.data import DataLoader, SyntheticDataset
from tpudet.data.preprocess import device_preprocess
from tpudet.models import FasterRCNN
from tpudet.serving import ServingModel, export_model, save_artifact
from tpudet.train.state import create_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(canvas=128, num_classes=3)
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    ds = SyntheticDataset(num_classes=3, num_examples=2, image_size=128)
    loader = DataLoader(cfg, ds, batch_size=2, shuffle=False, num_workers=2)
    batch = next(iter(loader.batches(0)))
    return cfg, model, state, batch


def test_export_matches_live_model(setup, tmp_path):
    cfg, model, state, batch = setup
    image = batch["image"]
    hw = batch["image_hw"].astype(np.float32)

    def live(image, image_hw):
        b = device_preprocess(
            cfg, {"image": image, "image_hw": image_hw}, training=False
        )
        return model.predict(state.variables, b)

    want = jax.device_get(jax.jit(live)(image, hw))

    path = tmp_path / "model.tpudet"
    meta = save_artifact(str(path), cfg, state.variables, batch_size=2)
    assert meta["batch_size"] == 2
    assert meta["canvas_height"] == 128

    serving = ServingModel.load(str(path))
    got = jax.device_get(serving(image, hw))
    assert set(got) == set(want)
    np.testing.assert_array_equal(got["valid"], want["valid"])
    np.testing.assert_array_equal(got["classes"], want["classes"])
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)
    np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-6)


def test_exported_platforms_recorded(setup):
    cfg, model, state, batch = setup
    exported = export_model(cfg, state.variables, batch_size=2)
    assert "cpu" in exported.platforms  # tests run on CPU


def test_serving_detect_original_coords(setup, tmp_path):
    cfg, model, state, batch = setup
    path = tmp_path / "model.tpudet"
    save_artifact(str(path), cfg, state.variables, batch_size=2)
    serving = ServingModel.load(str(path))

    rng = np.random.default_rng(0)
    # Three images (one short final batch) at non-canvas sizes, mixed aspect.
    images = [
        rng.integers(0, 255, (100, 160, 3), np.uint8),
        rng.integers(0, 255, (160, 90, 3), np.uint8),
        rng.integers(0, 255, (128, 128, 3), np.uint8),
    ]
    results = serving.detect(images, score_thresh=0.0)
    assert len(results) == 3
    for img, det in zip(images, results):
        h, w = img.shape[:2]
        boxes = det["boxes"]
        assert boxes.shape[1:] == (4,)
        assert det["scores"].shape == det["classes"].shape == boxes.shape[:1]
        if len(boxes):
            assert boxes[:, 0].min() >= 0 and boxes[:, 1].min() >= 0
            assert boxes[:, 2].max() <= w + 1e-3
            assert boxes[:, 3].max() <= h + 1e-3


def test_bucketed_artifact_routes_by_aspect(setup, tmp_path):
    import dataclasses

    cfg, model, state, batch = setup
    buckets = ((128, 128), (128, 192), (192, 128))
    bcfg = cfg.replace(data=dataclasses.replace(
        cfg.data, aspect_buckets=buckets, min_size=120, max_size=192))
    path = tmp_path / "bucketed.tpudet"
    meta = save_artifact(str(path), bcfg, state.variables, batch_size=2)
    assert [tuple(b) for b in meta["buckets"]] == list(buckets)

    serving = ServingModel.load(str(path))
    assert set(serving._calls) == set(buckets)

    rng = np.random.default_rng(0)
    # Mixed aspects -> different buckets; results must come back in order.
    images = [
        rng.integers(0, 255, (100, 100, 3), np.uint8),  # square
        rng.integers(0, 255, (100, 160, 3), np.uint8),  # wide
        rng.integers(0, 255, (160, 100, 3), np.uint8),  # tall
        rng.integers(0, 255, (101, 101, 3), np.uint8),  # square again
    ]
    results = serving.detect(images, score_thresh=0.0)
    assert len(results) == 4 and all(r is not None for r in results)
    for img, det in zip(images, results):
        h, w = img.shape[:2]
        if len(det["boxes"]):
            assert det["boxes"][:, 2].max() <= w + 1e-3
            assert det["boxes"][:, 3].max() <= h + 1e-3

    # Each bucket's module matches a live jitted model traced at that canvas.
    import jax

    from tpudet.data.preprocess import device_preprocess, prepare_example

    img = images[1]
    p = prepare_example(serving._data_cfg, img,
                        np.zeros((0, 4), np.float32), np.zeros(0, np.int32))
    assert p["image"].shape[:2] == (128, 192)
    canvases = np.stack([p["image"], np.zeros_like(p["image"])])
    hw = np.stack([p["image_hw"], p["image_hw"]]).astype(np.float32)

    def live(image, image_hw):
        b = device_preprocess(
            bcfg, {"image": image, "image_hw": image_hw}, training=False
        )
        return model.predict(state.variables, b)

    want = jax.device_get(jax.jit(live)(canvases, hw))
    got = jax.device_get(serving(canvases, hw))
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)
    np.testing.assert_array_equal(got["classes"], want["classes"])


def test_orientation_buckets_export_two_canvases(setup, tmp_path):
    """Legacy orientation mode must export both canvases, not the square."""
    import dataclasses

    cfg, model, state, batch = setup
    ocfg = cfg.replace(data=dataclasses.replace(
        cfg.data, orientation_buckets=True, canvas_short=64,
        canvas_height=128, canvas_width=128, min_size=60, max_size=128))
    path = tmp_path / "orient.tpudet"
    meta = save_artifact(str(path), ocfg, state.variables, batch_size=1)
    assert [tuple(b) for b in meta["buckets"]] == [(64, 128), (128, 64)]
    serving = ServingModel.load(str(path))
    assert set(serving._calls) == {(64, 128), (128, 64)}


def test_export_cli(setup, tmp_path):
    from tpudet.cli.export import main

    path = tmp_path / "cli_model.tpudet"
    main([
        "--preset", "tiny", "--output", str(path),
        "--batch-size", "1", "--verify",
    ])
    serving = ServingModel.load(str(path))
    assert serving.batch_size == 1


def test_export_fpn_model(tmp_path):
    """FPN models (BASELINE config 5 shape) export and match the live path."""
    cfg = tiny_test_config(canvas=128, num_classes=3, use_fpn=True)
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    ds = SyntheticDataset(num_classes=3, num_examples=2, image_size=128)
    loader = DataLoader(cfg, ds, batch_size=2, shuffle=False, num_workers=2)
    batch = next(iter(loader.batches(0)))
    image, hw = batch["image"], batch["image_hw"].astype(np.float32)

    def live(image, image_hw):
        b = device_preprocess(
            cfg, {"image": image, "image_hw": image_hw}, training=False
        )
        return model.predict(state.variables, b)

    want = jax.device_get(jax.jit(live)(image, hw))
    path = tmp_path / "fpn.tpudet"
    save_artifact(str(path), cfg, state.variables, batch_size=2)
    got = jax.device_get(ServingModel.load(str(path))(image, hw))
    np.testing.assert_array_equal(got["valid"], want["valid"])
    np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-5)


def test_tpu_platform_export_from_cpu_embeds_pallas():
    """A pure-TPU-platform export from a non-TPU host traces under the
    lowering override and embeds the REAL Mosaic kernels (visible as
    tpu_custom_call in the StableHLO), with pallas_embedded recorded; a
    mixed-platform export keeps the portable XLA paths and warns."""
    import warnings

    from tpudet.serving.export import _serving_metadata, export_model

    cfg = tiny_test_config().replace(use_pallas=True)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    exported = export_model(cfg, variables, batch_size=1, platforms=("tpu",))
    assert exported.platforms == ("tpu",)
    assert "tpu_custom_call" in exported.mlir_module()
    assert _serving_metadata(cfg, 1, ("tpu",))["pallas_embedded"] is True

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mixed = export_model(cfg, variables, batch_size=1,
                             platforms=("tpu", "cpu"))
    assert any("multi-platform" in str(x.message) for x in w)
    assert "tpu_custom_call" not in mixed.mlir_module()
    meta = _serving_metadata(cfg, 1, ("tpu", "cpu"))
    assert meta["pallas_embedded"] is False


def test_mixed_platform_export_from_tpu_host_keeps_xla_paths():
    """A mixed-platform export traced ON a TPU host must also carry the
    portable XLA paths: host-keyed dispatch would embed Mosaic custom calls
    that have no CPU lowering, breaking the artifact's cpu leg. Simulated by
    tracing under assume_tpu_lowering (the same dispatch state a real TPU
    host produces); assume_xla_lowering must take precedence."""
    import warnings

    from tpudet.kernels import assume_tpu_lowering
    from tpudet.serving.export import export_model

    cfg = tiny_test_config().replace(use_pallas=True)
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    with assume_tpu_lowering():
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            mixed = export_model(cfg, variables, batch_size=1,
                                 platforms=("tpu", "cpu"))
    assert any("multi-platform" in str(x.message) for x in w)
    assert "tpu_custom_call" not in mixed.mlir_module()
