"""ViTDet backbone (arXiv:2203.16527; tpudet/models/vit.py): window
partition correctness, window==global equivalence when the window covers
the grid, pyramid contract, pos-embed canvas resize, gradient flow, and
family integration (Faster R-CNN + Mask R-CNN on the vit backbone)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.config import tiny_vitdet_config
from tpudet.models import build_model
from tpudet.models.vit import (
    VIT_VARIANTS,
    SimpleFeaturePyramid,
    ViT,
    _window_partition,
    _window_unpartition,
)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    for h, w, win in [(8, 8, 4), (7, 9, 4), (3, 3, 4), (8, 12, 3)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 5)), jnp.float32)
        part, hw_pad = _window_partition(x, win)
        assert part.shape[1] == win * win
        back = _window_unpartition(part, win, hw_pad, (h, w), 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_covering_grid_equals_global():
    """With window >= the token grid, a windowed block must compute exactly
    the same attention as a global block (same params) — the partition is
    then a single (possibly padded) window.

    Padding caveat: pad tokens DO enter the window softmax, so exact
    equality needs an unpadded cover — use window == grid side."""
    vit_w = ViT(dim=32, depth=1, heads=2, patch=16, window=8,
                global_attn_every=10**9, pos_grid=8)
    vit_g = ViT(dim=32, depth=1, heads=2, patch=16, window=8,
                global_attn_every=1, pos_grid=8)
    x = jax.random.uniform(jax.random.key(0), (1, 128, 128, 3))
    v = vit_w.init(jax.random.key(1), x)
    out_w = vit_w.apply(v, x)["plain"]
    out_g = vit_g.apply(v, x)["plain"]
    np.testing.assert_allclose(
        np.asarray(out_w), np.asarray(out_g), rtol=1e-5, atol=1e-5
    )


def test_pyramid_contract_strides_and_channels():
    cfg = tiny_vitdet_config()
    m = build_model(cfg)
    v = m.init(jax.random.key(0))
    from tpudet.models.faster_rcnn import DetectorCore

    core = DetectorCore(cfg)
    feats = core.apply(v, jnp.zeros((1, 128, 128, 3)),
                       method=DetectorCore.features)
    assert sorted(feats.keys()) == ["p2", "p3", "p4", "p5", "p6"]
    for name, stride in [("p2", 4), ("p3", 8), ("p4", 16), ("p5", 32),
                         ("p6", 64)]:
        assert feats[name].shape[1:3] == (128 // stride, 128 // stride), name
        assert feats[name].shape[-1] == 256


def test_pos_embed_resizes_to_other_canvas():
    """A canvas whose token grid differs from pos_grid traces through the
    bilinear resize; an identical backbone on the native grid skips it.
    Both must run and give finite outputs."""
    vit = ViT(dim=32, depth=1, heads=2, patch=16, window=4, pos_grid=8)
    x128 = jnp.ones((1, 128, 128, 3))
    x192 = jnp.ones((1, 192, 160, 3))
    v = vit.init(jax.random.key(0), x128)
    out = vit.apply(v, x192)["plain"]
    assert out.shape == (1, 12, 10, 32)
    assert bool(jnp.isfinite(out).all())


def test_vit_rejects_indivisible_canvas():
    vit = ViT(dim=32, depth=1, heads=2, patch=16)
    with pytest.raises(ValueError, match="divisible"):
        vit.init(jax.random.key(0), jnp.ones((1, 130, 128, 3)))


def test_vitdet_requires_fpn():
    cfg = tiny_vitdet_config()
    cfg = cfg.replace(
        backbone=dataclasses.replace(cfg.backbone, use_fpn=False)
    )
    m = build_model(cfg)
    with pytest.raises(ValueError, match="use_fpn"):
        m.init(jax.random.key(0))


def _tiny_batch(cfg, key):
    h, w = cfg.data.canvas_height, cfg.data.canvas_width
    n = cfg.data.max_gt_boxes
    boxes = jnp.tile(jnp.array([[10.0, 10.0, 60.0, 60.0]]), (n, 1))
    return {
        "image": jax.random.uniform(key, (2, h, w, 3), jnp.float32),
        "image_hw": jnp.array([[h, w]] * 2, jnp.int32),
        "gt_boxes": jnp.stack([boxes, boxes]),
        "gt_classes": jnp.ones((2, n), jnp.int32),
        "gt_valid": jnp.stack([
            jnp.arange(n) < 2, jnp.arange(n) < 1,
        ]),
    }


def test_vitdet_gradients_reach_every_block():
    """One loss/grad evaluation: every ViT block's attention and MLP params
    receive nonzero gradient (the backbone genuinely trains — catches
    stop_gradient or wiring mistakes), and the loss is finite."""
    cfg = tiny_vitdet_config()
    m = build_model(cfg)
    v = m.init(jax.random.key(0))
    batch = _tiny_batch(cfg, jax.random.key(1))

    def loss_fn(params):
        out = m.loss({"params": params}, batch, jax.random.key(2))
        return out[0] if isinstance(out, tuple) else out

    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert bool(jnp.isfinite(loss))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {}
    for path, g in flat:
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "block" in name:
            block = name.split("/")[1] if "backbone" in name else name
            touched.setdefault(block, 0.0)
            touched[block] += float(jnp.abs(g).sum())
    assert touched, "no ViT block gradients found"
    for block, total in touched.items():
        assert total > 0, f"{block} got zero gradient"


def test_vitdet_mask_rcnn_family_runs():
    """The vit backbone under a different family (Mask R-CNN) through the
    same p2-p6 contract."""
    from tpudet.config import tiny_maskrcnn_config

    base = tiny_maskrcnn_config()
    cfg = base.replace(
        backbone=dataclasses.replace(
            base.backbone, name="vit_tiny", use_fpn=True,
            vit_window=4, vit_global_attn_every=2, vit_pos_grid=8,
        )
    )
    m = build_model(cfg)
    v = m.init(jax.random.key(0))
    h, w = cfg.data.canvas_height, cfg.data.canvas_width
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (1, h, w, 3)),
        "image_hw": jnp.array([[h, w]], jnp.int32),
    }
    out = m.predict(v, batch)
    assert "masks" in out
    assert out["boxes"].shape[-1] == 4


def test_vitdet_tensor_parallel_mesh():
    """dp=4 x tp=2 over 8 fake devices: the ViT blocks' q/k/v and MLP
    kernels shard over 'model' under the Megatron rules (each shard owns
    one of the two heads end-to-end), the layout survives a donated train
    step, and the loss is finite."""
    import dataclasses as _dc

    from tpudet.data import DataLoader, SyntheticDataset
    from tpudet.data.preprocess import device_preprocess
    from tpudet.config import TrainConfig
    from tpudet.parallel import make_mesh, shard_batch
    from tpudet.parallel.sharding_rules import shard_train_state
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step

    cfg = tiny_vitdet_config().replace(
        train=TrainConfig(batch_size=4, learning_rate=1e-3, warmup_steps=0,
                          checkpoint_every=10**9)
    )
    model = build_model(cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    state = shard_train_state(mesh, state)
    blk = state.params["backbone"]["block0"]
    for name in ("query", "key", "value"):
        assert not blk["attn"][name]["kernel"].sharding.is_fully_replicated
    assert not blk["attn"]["out"]["kernel"].sharding.is_fully_replicated
    assert not blk["mlp_fc1"]["kernel"].sharding.is_fully_replicated
    # LayerNorms and the patch embed stay replicated.
    assert blk["norm1"]["scale"].sharding.is_fully_replicated
    assert state.params["backbone"]["patch_embed"][
        "kernel"].sharding.is_fully_replicated

    step = make_train_step(model, cfg, mesh=mesh, state_example=state)
    ds = SyntheticDataset(num_classes=cfg.data.num_classes, num_examples=4,
                          image_size=cfg.data.canvas_height)
    raw = next(iter(DataLoader(cfg, ds, batch_size=4,
                               num_workers=2).batches(0)))
    raw = {k: jnp.asarray(v) for k, v in raw.items()}
    batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
    batch = shard_batch(mesh, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    blk = state.params["backbone"]["block0"]
    assert not blk["attn"]["query"]["kernel"].sharding.is_fully_replicated


def test_vit_variants_table():
    for name, (dim, depth, heads) in VIT_VARIANTS.items():
        assert dim % heads == 0, name


def test_preset_builds():
    from tpudet.cli.common import preset_config

    cfg = preset_config("coco_vitdet_b")
    assert cfg.backbone.name == "vit_b"
    assert cfg.train.optimizer == "adamw"
    # All COCO buckets must be patch-divisible for the ViT stem.
    for hh, ww in cfg.data.aspect_buckets:
        assert hh % 16 == 0 and ww % 16 == 0
    cfg2 = preset_config("vitdet_tiny")
    assert cfg2.backbone.name == "vit_tiny"
