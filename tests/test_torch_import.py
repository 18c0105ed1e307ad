"""torchvision-layout weight import parity (import_weights.convert_torch_resnet).

torchvision itself is not installed; instead the test builds a random
state dict in the exact torchvision ResNet-50 layout and runs a minimal
functional torch forward (conv2d/batch_norm/max_pool2d — the v1.5
convention: downsampling stride on the 3x3 conv) as the oracle. The Flax
backbone built with ``stride_in_1x1=False`` + converted weights must match
every pyramid level.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tpudet.models.import_weights import convert_torch_resnet  # noqa: E402
from tpudet.models.resnet import ResNet  # noqa: E402

BLOCKS = (3, 4, 6, 3)  # resnet50


def _random_torch_state_dict(rng):
    sd = {}

    def conv(key, out_ch, in_ch, k):
        sd[key + ".weight"] = torch.tensor(
            rng.normal(0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        )

    def bn(key, ch):
        sd[key + ".weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, ch).astype(np.float32))
        sd[key + ".bias"] = torch.tensor(
            rng.normal(0, 0.1, ch).astype(np.float32))
        sd[key + ".running_mean"] = torch.tensor(
            rng.normal(0, 0.1, ch).astype(np.float32))
        sd[key + ".running_var"] = torch.tensor(
            rng.uniform(0.5, 2.0, ch).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, n_blocks in enumerate(BLOCKS):
        width, out_ch = 64 * 2 ** s, 256 * 2 ** s
        for i in range(n_blocks):
            t = f"layer{s + 1}.{i}"
            if i == 0:
                conv(f"{t}.downsample.0", out_ch, in_ch, 1)
                bn(f"{t}.downsample.1", out_ch)
            conv(f"{t}.conv1", width, in_ch, 1)
            bn(f"{t}.bn1", width)
            conv(f"{t}.conv2", width, width, 3)
            bn(f"{t}.bn2", width)
            conv(f"{t}.conv3", out_ch, width, 1)
            bn(f"{t}.bn3", out_ch)
            in_ch = out_ch
    return sd


def _torch_forward(sd, x):
    """Functional torchvision-v1.5 ResNet forward -> {"c2".."c5"} NCHW."""

    def bn(x, p):
        return F.batch_norm(
            x, sd[p + ".running_mean"], sd[p + ".running_var"],
            sd[p + ".weight"], sd[p + ".bias"], training=False, eps=1e-5,
        )

    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = {}
    for s, n_blocks in enumerate(BLOCKS):
        for i in range(n_blocks):
            t = f"layer{s + 1}.{i}"
            stride = 2 if (i == 0 and s > 0) else 1
            identity = x
            if f"{t}.downsample.0.weight" in sd:
                identity = bn(
                    F.conv2d(x, sd[f"{t}.downsample.0.weight"], stride=stride),
                    f"{t}.downsample.1",
                )
            y = F.relu(bn(F.conv2d(x, sd[f"{t}.conv1.weight"]), f"{t}.bn1"))
            y = F.relu(bn(
                F.conv2d(y, sd[f"{t}.conv2.weight"], stride=stride, padding=1),
                f"{t}.bn2",
            ))
            y = bn(F.conv2d(y, sd[f"{t}.conv3.weight"]), f"{t}.bn3")
            x = F.relu(y + identity)
        feats[f"c{s + 2}"] = x
    return feats


def _assert_tree_shapes_match(want, got, path=""):
    assert set(want) == set(got), f"{path}: {set(want) ^ set(got)}"
    for k in want:
        if isinstance(want[k], dict):
            _assert_tree_shapes_match(want[k], got[k], f"{path}{k}/")
        else:
            assert np.shape(want[k]) == np.shape(got[k]), f"{path}{k}"


def test_torch_resnet50_stage_parity(rng):
    sd = _random_torch_state_dict(rng)
    params, constants = convert_torch_resnet(sd, "resnet50")

    model = ResNet(blocks=BLOCKS, norm="frozen_bn", dtype=jnp.float32,
                   freeze_stem=False, stride_in_1x1=False)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    init_vars = model.init(jax.random.key(0), jnp.asarray(x))
    _assert_tree_shapes_match(init_vars["params"], params)
    _assert_tree_shapes_match(init_vars["constants"], constants)

    feats = model.apply({"params": params, "constants": constants},
                        jnp.asarray(x))
    with torch.no_grad():
        want = _torch_forward(sd, torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    for level in ("c2", "c3", "c4", "c5"):
        got = np.asarray(feats[level])
        ref = np.transpose(want[level].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3,
                                   err_msg=level)


def test_torch_npz_roundtrip(rng, tmp_path):
    from tpudet.models.import_weights import (
        load_backbone_npz, save_backbone_npz,
    )

    sd = _random_torch_state_dict(rng)
    params, constants = convert_torch_resnet(sd, "resnet50")
    path = str(tmp_path / "torch_r50.npz")
    save_backbone_npz(path, params, constants)
    p2, c2 = load_backbone_npz(path)
    np.testing.assert_array_equal(
        p2["stage3_block0"]["conv2"]["kernel"],
        params["stage3_block0"]["conv2"]["kernel"],
    )
    np.testing.assert_array_equal(
        c2["stage5_block2"]["norm3"]["var"],
        constants["stage5_block2"]["norm3"]["var"],
    )


def test_torch_import_requires_v15_stride(rng):
    """With the default stride_in_1x1=True the same weights must NOT match —
    guards against silently importing torch weights into the wrong block
    convention (shapes agree either way, values don't)."""
    sd = _random_torch_state_dict(rng)
    params, constants = convert_torch_resnet(sd, "resnet50")
    model = ResNet(blocks=BLOCKS, norm="frozen_bn", dtype=jnp.float32,
                   freeze_stem=False, stride_in_1x1=True)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    feats = model.apply({"params": params, "constants": constants},
                        jnp.asarray(x))
    with torch.no_grad():
        want = _torch_forward(sd, torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(want["c5"].numpy(), (0, 2, 3, 1))
    assert not np.allclose(np.asarray(feats["c5"]), ref, rtol=1e-3, atol=1e-3)


def test_torch_vgg16_parity():
    """torchvision-layout VGG16 state dict -> tpudet VGG: a minimal
    functional torch forward (conv2d/relu/max_pool2d at torchvision's
    features.* indices) is the oracle; every pyramid level must match."""
    from tpudet.models.import_weights import convert_torch_vgg16
    from tpudet.models.vgg import VGG, VGG16_STAGES

    rng = np.random.default_rng(7)
    sd = {}
    idx, in_ch = 0, 3
    for n_convs, ch in VGG16_STAGES:
        for _ in range(n_convs):
            sd[f"features.{idx}.weight"] = torch.tensor(
                rng.normal(0, 0.05, (ch, in_ch, 3, 3)).astype(np.float32))
            sd[f"features.{idx}.bias"] = torch.tensor(
                rng.normal(0, 0.1, ch).astype(np.float32))
            in_ch = ch
            idx += 2
        idx += 1

    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)

    # Torch oracle (NCHW), collecting the c2..c5 contract.
    t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    want = {}
    idx = 0
    for stage, (n_convs, _ch) in enumerate(VGG16_STAGES, start=1):
        if stage > 1:
            t = F.max_pool2d(t, 2, 2)
        for _ in range(n_convs):
            t = F.relu(F.conv2d(t, sd[f"features.{idx}.weight"],
                                sd[f"features.{idx}.bias"], padding=1))
            idx += 2
        idx += 1
        if stage >= 3:
            want[f"c{stage - 1}"] = t
    want["c5"] = F.max_pool2d(t, 2, 2)

    params, constants = convert_torch_vgg16(sd)
    assert constants == {}
    feats = VGG(freeze_stem=False).apply({"params": params}, jnp.asarray(x))
    for k in ("c2", "c3", "c4", "c5"):
        got = np.asarray(feats[k])
        ref = np.transpose(want[k].numpy(), (0, 2, 3, 1))
        assert got.shape == ref.shape, (k, got.shape, ref.shape)
        # 13 stacked random convs compound activations to O(100s); torch vs
        # XLA conv summation order then differs at ~1e-3 abs.
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-3, err_msg=k)


def test_torch_resnet18_basic_block_parity(rng):
    """torchvision-layout ResNet-18 (basic blocks, layer{s}.{i}.conv{1,2})
    -> tpudet ResNet(basic=True): every pyramid level matches a functional
    torch oracle."""
    from tpudet.models.resnet import STAGE_BLOCKS

    blocks = STAGE_BLOCKS["resnet18"]
    sd = {}

    def conv(key, out_ch, in_ch, k):
        sd[key + ".weight"] = torch.tensor(
            rng.normal(0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32))

    def bn(key, ch):
        sd[key + ".weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, ch).astype(np.float32))
        sd[key + ".bias"] = torch.tensor(
            rng.normal(0, 0.1, ch).astype(np.float32))
        sd[key + ".running_mean"] = torch.tensor(
            rng.normal(0, 0.1, ch).astype(np.float32))
        sd[key + ".running_var"] = torch.tensor(
            rng.uniform(0.5, 2.0, ch).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, n_blocks in enumerate(blocks):
        out_ch = 64 * 2 ** s
        for i in range(n_blocks):
            t = f"layer{s + 1}.{i}"
            if i == 0 and (out_ch != in_ch or s > 0):
                conv(f"{t}.downsample.0", out_ch, in_ch, 1)
                bn(f"{t}.downsample.1", out_ch)
            conv(f"{t}.conv1", out_ch, in_ch, 3)
            bn(f"{t}.bn1", out_ch)
            conv(f"{t}.conv2", out_ch, out_ch, 3)
            bn(f"{t}.bn2", out_ch)
            in_ch = out_ch

    def tbn(x, p):
        return F.batch_norm(
            x, sd[p + ".running_mean"], sd[p + ".running_var"],
            sd[p + ".weight"], sd[p + ".bias"], training=False, eps=1e-5,
        )

    x_np = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.tensor(np.transpose(x_np, (0, 3, 1, 2)))
        t = F.relu(tbn(F.conv2d(t, sd["conv1.weight"], stride=2, padding=3),
                       "bn1"))
        t = F.max_pool2d(t, 3, stride=2, padding=1)
        want = {}
        for s, n_blocks in enumerate(blocks):
            for i in range(n_blocks):
                tt = f"layer{s + 1}.{i}"
                stride = 2 if (i == 0 and s > 0) else 1
                identity = t
                if f"{tt}.downsample.0.weight" in sd:
                    identity = tbn(
                        F.conv2d(t, sd[f"{tt}.downsample.0.weight"],
                                 stride=stride),
                        f"{tt}.downsample.1",
                    )
                y = F.relu(tbn(
                    F.conv2d(t, sd[f"{tt}.conv1.weight"], stride=stride,
                             padding=1), f"{tt}.bn1"))
                y = tbn(F.conv2d(y, sd[f"{tt}.conv2.weight"], padding=1),
                        f"{tt}.bn2")
                t = F.relu(y + identity)
            want[f"c{s + 2}"] = t

    from tpudet.models.import_weights import convert_torch_resnet

    params, constants = convert_torch_resnet(sd, "resnet18")
    model = ResNet(blocks=blocks, norm="frozen_bn", freeze_stem=False,
                   basic=True)
    feats = model.apply({"params": params, "constants": constants},
                        jnp.asarray(x_np))
    for level in ("c2", "c3", "c4", "c5"):
        got = np.asarray(feats[level])
        ref = np.transpose(want[level].numpy(), (0, 2, 3, 1))
        assert got.shape == ref.shape, (level, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3,
                                   err_msg=level)


# --------------------------------------------------------------- ViT import

VIT_DIM, VIT_DEPTH, VIT_HEADS, VIT_GRID = 32, 2, 2, 8


def _random_torch_vit_state_dict(rng, cls_token=True):
    """Random state dict in the exact timm/MAE plain-ViT layout."""
    sd = {}

    def lin(key, out_d, in_d):
        sd[key + ".weight"] = torch.tensor(
            rng.normal(0, 0.05, (out_d, in_d)).astype(np.float32))
        sd[key + ".bias"] = torch.tensor(
            rng.normal(0, 0.02, out_d).astype(np.float32))

    def ln(key, d):
        sd[key + ".weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, d).astype(np.float32))
        sd[key + ".bias"] = torch.tensor(
            rng.normal(0, 0.1, d).astype(np.float32))

    d = VIT_DIM
    sd["patch_embed.proj.weight"] = torch.tensor(
        rng.normal(0, 0.05, (d, 3, 16, 16)).astype(np.float32))
    sd["patch_embed.proj.bias"] = torch.tensor(
        rng.normal(0, 0.02, d).astype(np.float32))
    n = VIT_GRID * VIT_GRID + (1 if cls_token else 0)
    sd["pos_embed"] = torch.tensor(
        rng.normal(0, 0.02, (1, n, d)).astype(np.float32))
    for i in range(VIT_DEPTH):
        ln(f"blocks.{i}.norm1", d)
        lin(f"blocks.{i}.attn.qkv", 3 * d, d)
        lin(f"blocks.{i}.attn.proj", d, d)
        ln(f"blocks.{i}.norm2", d)
        lin(f"blocks.{i}.mlp.fc1", 4 * d, d)
        lin(f"blocks.{i}.mlp.fc2", d, 4 * d)
    ln("norm", d)
    return sd


def _torch_vit_forward(sd, x):
    """Functional timm-style ViT forward (global attention every block,
    cls token dropped) -> [B, Hp, Wp, D]."""
    d, h = VIT_DIM, VIT_HEADS
    x = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=16)   # [B, D, Hp, Wp]
    b, _, hp, wp = x.shape
    x = x.permute(0, 2, 3, 1).reshape(b, hp * wp, d)
    pos = sd["pos_embed"]
    if pos.shape[1] == hp * wp + 1:
        pos = pos[:, 1:]
    x = x + pos

    def ln(y, key):
        return F.layer_norm(y, (d,), sd[key + ".weight"], sd[key + ".bias"])

    for i in range(VIT_DEPTH):
        y = ln(x, f"blocks.{i}.norm1")
        qkv = F.linear(y, sd[f"blocks.{i}.attn.qkv.weight"],
                       sd[f"blocks.{i}.attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        hd = d // h

        def heads(t):
            return t.reshape(b, -1, h, hd).transpose(1, 2)

        attn = torch.softmax(
            heads(q) @ heads(k).transpose(-2, -1) * hd ** -0.5, dim=-1)
        y = (attn @ heads(v)).transpose(1, 2).reshape(b, -1, d)
        y = F.linear(y, sd[f"blocks.{i}.attn.proj.weight"],
                     sd[f"blocks.{i}.attn.proj.bias"])
        x = x + y
        y = ln(x, f"blocks.{i}.norm2")
        y = F.linear(y, sd[f"blocks.{i}.mlp.fc1.weight"],
                     sd[f"blocks.{i}.mlp.fc1.bias"])
        y = F.linear(F.gelu(y), sd[f"blocks.{i}.mlp.fc2.weight"],
                     sd[f"blocks.{i}.mlp.fc2.bias"])
        x = x + y
    x = ln(x, "norm")
    return x.reshape(b, hp, wp, d)


@pytest.mark.parametrize("cls_token", [True, False])
def test_torch_vit_parity(rng, cls_token):
    """convert_torch_vit + the ViT backbone (all-global blocks) match the
    functional timm-style torch oracle on the native pos grid, cls token
    dropped."""
    from tpudet.models.import_weights import convert_torch_vit
    from tpudet.models.vit import ViT

    sd = _random_torch_vit_state_dict(rng, cls_token=cls_token)
    params, constants = convert_torch_vit(sd, pos_grid=VIT_GRID)
    assert constants == {}

    vit = ViT(dim=VIT_DIM, depth=VIT_DEPTH, heads=VIT_HEADS, patch=16,
              window=4, global_attn_every=1, pos_grid=VIT_GRID)
    x = rng.normal(0, 1, (2, 128, 128, 3)).astype(np.float32)
    want = _torch_vit_forward(
        sd, torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    ).detach().numpy()
    got = np.asarray(vit.apply({"params": params}, jnp.asarray(x))["plain"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_torch_vit_import_resizes_pos_grid(rng):
    from tpudet.models.import_weights import convert_torch_vit

    sd = _random_torch_vit_state_dict(rng, cls_token=True)
    params, _ = convert_torch_vit(sd, pos_grid=16)
    assert params["pos_embed"].shape == (1, 16, 16, VIT_DIM)
