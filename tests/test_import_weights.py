"""Keras→tpudet backbone parity (SURVEY.md §4.2 "TF2 parity fixtures"):
convert a randomly-initialized Keras ResNet-50 and assert the tpudet forward
matches the Keras intermediate activations within float tolerance. This is
the exact mechanism that imports ImageNet weights where network exists."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tpudet.models.resnet import ResNet  # noqa: E402
from tpudet.models.import_weights import (  # noqa: E402
    convert_keras_resnet,
    save_backbone_npz,
    load_backbone_npz,
)


@pytest.fixture(scope="module")
def keras_r50():
    tf.keras.utils.set_random_seed(0)
    return tf.keras.applications.ResNet50(
        weights=None, include_top=False, input_shape=(64, 64, 3)
    )


def test_keras_parity_c4_c5(keras_r50):
    params, constants = convert_keras_resnet(keras_r50, "resnet50")

    model = ResNet(blocks=(3, 4, 6, 3), norm="frozen_bn", freeze_stem=False)
    x = np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = {"params": params, "constants": constants}
    feats = model.apply(variables, jnp.asarray(x))

    # Keras reference activations at the stage outputs.
    for keras_layer, ours in [
        ("conv2_block3_out", "c2"),
        ("conv3_block4_out", "c3"),
        ("conv4_block6_out", "c4"),
        ("conv5_block3_out", "c5"),
    ]:
        ref_model = tf.keras.Model(
            keras_r50.input, keras_r50.get_layer(keras_layer).output
        )
        want = ref_model(x, training=False).numpy()
        got = np.asarray(feats[ours])
        assert got.shape == want.shape, (ours, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3,
                                   err_msg=ours)


def test_npz_roundtrip(keras_r50, tmp_path):
    params, constants = convert_keras_resnet(keras_r50, "resnet50")
    path = str(tmp_path / "r50.npz")
    save_backbone_npz(path, params, constants)
    p2, c2 = load_backbone_npz(path)
    np.testing.assert_array_equal(
        params["stage2_block0"]["conv1"]["kernel"],
        p2["stage2_block0"]["conv1"]["kernel"],
    )
    np.testing.assert_array_equal(
        constants["norm_stem"]["mean"], c2["norm_stem"]["mean"]
    )


def test_apply_backbone_weights(keras_r50):
    from tpudet.config import Config, DataConfig, BackboneConfig
    from tpudet.models import FasterRCNN
    from tpudet.models.import_weights import apply_backbone_weights

    cfg = Config(
        data=DataConfig(canvas_height=64, canvas_width=64, num_classes=3),
        backbone=BackboneConfig(name="resnet50"),
    )
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    params, constants = convert_keras_resnet(keras_r50, "resnet50")
    merged = apply_backbone_weights(variables, params, constants)
    got = np.asarray(
        merged["params"]["backbone"]["stem_conv"]["kernel"]
    )
    np.testing.assert_array_equal(got, params["stem_conv"]["kernel"])
    # Non-backbone params untouched.
    a = jax.tree_util.tree_leaves(variables["params"]["rpn_head"])
    b = jax.tree_util.tree_leaves(merged["params"]["rpn_head"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_keras_vgg16_parity():
    """keras.applications VGG16 → tpudet VGG: stage activations match at
    conv3_3 / conv4_3 / conv5_3 / pool5 (the c2..c5 contract)."""
    from tpudet.models.vgg import VGG
    from tpudet.models.import_weights import convert_keras_vgg16

    tf.keras.utils.set_random_seed(1)
    keras_vgg = tf.keras.applications.VGG16(
        weights=None, include_top=False, input_shape=(64, 64, 3)
    )
    params, constants = convert_keras_vgg16(keras_vgg)
    assert constants == {}  # VGG has no norm layers

    model = VGG(freeze_stem=False)
    x = np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    feats = model.apply({"params": params}, jnp.asarray(x))

    for keras_layer, ours in [
        ("block3_conv3", "c2"),
        ("block4_conv3", "c3"),
        ("block5_conv3", "c4"),
        ("block5_pool", "c5"),
    ]:
        ref_model = tf.keras.Model(
            keras_vgg.input, keras_vgg.get_layer(keras_layer).output
        )
        want = ref_model(x, training=False).numpy()
        got = np.asarray(feats[ours])
        assert got.shape == want.shape, (ours, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=ours)


def test_keras_vgg16_npz_roundtrip_into_model(tmp_path):
    """Converted VGG weights survive the npz round-trip and merge into a
    full FasterRCNN variables tree (the --backbone-weights path)."""
    import dataclasses

    from tpudet.config import tiny_test_config
    from tpudet.models import FasterRCNN
    from tpudet.models.import_weights import (
        apply_backbone_weights,
        convert_keras_vgg16,
    )

    tf.keras.utils.set_random_seed(2)
    keras_vgg = tf.keras.applications.VGG16(
        weights=None, include_top=False, input_shape=(64, 64, 3)
    )
    params, constants = convert_keras_vgg16(keras_vgg)
    path = str(tmp_path / "vgg16.npz")
    save_backbone_npz(path, params, constants)
    params2, constants2 = load_backbone_npz(path)

    cfg = tiny_test_config()
    cfg = cfg.replace(backbone=dataclasses.replace(cfg.backbone, name="vgg16"))
    model = FasterRCNN(cfg)
    variables = model.init(jax.random.key(0))
    merged = apply_backbone_weights(variables, params2, constants2)
    got = np.asarray(
        merged["params"]["backbone"]["stage1"]["conv1_1"]["kernel"]
    )
    np.testing.assert_array_equal(
        got, np.asarray(params["stage1"]["conv1_1"]["kernel"])
    )
