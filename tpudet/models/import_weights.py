"""Pretrained-weight import: Keras-applications ResNet → tpudet backbone
(SURVEY.md C5 "port pretrained weights"; §7 hard-parts note: no network in the
build environment, so conversion runs wherever a Keras checkpoint exists and
the result ships as a .npz).

Keras ``ResNet50/101`` layout (what the TF2 reference uses):
  conv1_conv / conv1_bn                          → stem_conv / norm_stem
  conv{s}_block{b}_0_{conv,bn}  (projection)     → stage{s}_block{b-1}/conv_proj, norm_proj
  conv{s}_block{b}_{1,2,3}_{conv,bn}             → .../conv{1,2,3}, norm{1,2,3}

Semantics notes:
  * Keras ResNet convs carry biases; tpudet convs don't. The bias folds
    exactly into the frozen-BN statistics: (x + bias - μ) ≡ (x - (μ - bias)).
  * Keras puts the downsampling stride on the first 1x1 conv — matches
    tpudet's default ``stride_in_1x1=True`` (Bottleneck docstring).
  * BN weights order in Keras: [gamma, beta, moving_mean, moving_variance].
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import numpy as np

STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def convert_keras_resnet(
    keras_model: Any, name: str = "resnet50"
) -> Tuple[Dict, Dict]:
    """Keras model -> (backbone params, backbone 'constants') numpy trees."""
    layers = {layer.name: layer for layer in keras_model.layers}

    def conv_w(lname):
        w = layers[lname].get_weights()
        kernel = np.asarray(w[0], np.float32)
        bias = np.asarray(w[1], np.float32) if len(w) > 1 else None
        return kernel, bias

    def bn_w(lname, conv_bias):
        gamma, beta, mean, var = [np.asarray(a, np.float32)
                                  for a in layers[lname].get_weights()]
        if conv_bias is not None:
            mean = mean - conv_bias  # fold the conv bias into the stats
        return {"scale": gamma, "bias": beta, "mean": mean, "var": var}

    params: Dict = {}
    constants: Dict = {}

    k, b = conv_w("conv1_conv")
    params["stem_conv"] = {"kernel": k}
    constants["norm_stem"] = bn_w("conv1_bn", b)

    blocks = STAGE_BLOCKS[name]
    for stage, n_blocks in enumerate(blocks):
        ks = stage + 2  # keras conv2..conv5
        for blk in range(n_blocks):
            kb = blk + 1  # keras blocks are 1-based
            our = f"stage{ks}_block{blk}"
            p: Dict = {}
            c: Dict = {}
            if blk == 0:  # projection block
                k, b = conv_w(f"conv{ks}_block{kb}_0_conv")
                p["conv_proj"] = {"kernel": k}
                c["norm_proj"] = bn_w(f"conv{ks}_block{kb}_0_bn", b)
            for j in (1, 2, 3):
                k, b = conv_w(f"conv{ks}_block{kb}_{j}_conv")
                p[f"conv{j}"] = {"kernel": k}
                c[f"norm{j}"] = bn_w(f"conv{ks}_block{kb}_{j}_bn", b)
            params[our] = p
            constants[our] = c
    return params, constants


def convert_keras_vgg16(keras_model: Any) -> Tuple[Dict, Dict]:
    """keras.applications VGG16 -> (params, constants) for models/vgg.py.

    Near-direct: Keras names convs ``block{s}_conv{i}``, tpudet names them
    ``stage{s}/conv{s}_{i}``; kernels are HWIO in both, VGG convs carry
    biases in both, and there are no norm layers (constants is empty)."""
    layers = {layer.name: layer for layer in keras_model.layers}
    from tpudet.models.vgg import VGG16_STAGES

    params: Dict = {}
    for stage, (n_convs, _ch) in enumerate(VGG16_STAGES, start=1):
        p: Dict = {}
        for i in range(1, n_convs + 1):
            w = layers[f"block{stage}_conv{i}"].get_weights()
            p[f"conv{stage}_{i}"] = {
                "kernel": np.asarray(w[0], np.float32),
                "bias": np.asarray(w[1], np.float32),
            }
        params[f"stage{stage}"] = p
    return params, {}


def convert_torch_resnet(
    state_dict: Dict[str, Any], name: str = "resnet50"
) -> Tuple[Dict, Dict]:
    """torchvision-layout ResNet state dict -> (params, constants) trees.

    Layout: ``conv1.weight`` / ``bn1.*`` (stem), ``layer{1..4}.{i}.conv{1..3}.
    weight`` + ``bn{1..3}.*`` per bottleneck, ``layer{s}.0.downsample.{0,1}``
    projection. Accepts tensors or ndarrays (``.pth`` state dicts work without
    torchvision installed).

    Semantics notes:
      * torch conv kernels are [O, I, kh, kw] -> transposed to NHWC's
        [kh, kw, I, O]; torchvision ResNets have no conv biases.
      * torchvision puts the downsampling stride on the 3x3 conv ("v1.5") —
        the model MUST be built with ``BackboneConfig.stride_in_1x1=False``
        for bottleneck weights (resnet50/101). Basic blocks (resnet18/34,
        ``layer{s}.{i}.conv{1,2}``) have no such convention split.
      * BN: weight=gamma, bias=beta, running_mean, running_var (eps 1e-5,
        same as tpudet's FrozenBatchNorm).
    """
    from tpudet.models.resnet import BASIC_BLOCK
    from tpudet.models.resnet import STAGE_BLOCKS as MODEL_STAGE_BLOCKS

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        return np.asarray(v, np.float32)

    def conv_w(key):
        return np.transpose(arr(key + ".weight"), (2, 3, 1, 0))

    def bn_w(prefix):
        return {
            "scale": arr(prefix + ".weight"),
            "bias": arr(prefix + ".bias"),
            "mean": arr(prefix + ".running_mean"),
            "var": arr(prefix + ".running_var"),
        }

    params: Dict = {"stem_conv": {"kernel": conv_w("conv1")}}
    constants: Dict = {"norm_stem": bn_w("bn1")}

    convs_per_block = (1, 2) if name in BASIC_BLOCK else (1, 2, 3)
    for stage, n_blocks in enumerate(MODEL_STAGE_BLOCKS[name]):
        layer = f"layer{stage + 1}"
        for blk in range(n_blocks):
            t = f"{layer}.{blk}"
            our = f"stage{stage + 2}_block{blk}"
            p: Dict = {}
            c: Dict = {}
            if f"{t}.downsample.0.weight" in state_dict:
                p["conv_proj"] = {"kernel": conv_w(f"{t}.downsample.0")}
                c["norm_proj"] = bn_w(f"{t}.downsample.1")
            for j in convs_per_block:
                p[f"conv{j}"] = {"kernel": conv_w(f"{t}.conv{j}")}
                c[f"norm{j}"] = bn_w(f"{t}.bn{j}")
            params[our] = p
            constants[our] = c
    return params, constants


def convert_torch_vgg16(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision-layout VGG16 state dict -> (params, constants) trees.

    torchvision's ``vgg16().features`` is a flat Sequential whose conv
    indices are fixed by the maxpool/ReLU interleaving: stage boundaries at
    features.{0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28}. Kernels are
    [O, I, kh, kw] -> transposed to [kh, kw, I, O]; VGG convs carry biases
    in both layouts; no norm layers (constants is empty). Unlike ResNet
    there is NO stride-convention caveat — all convs are 3x3/s1."""
    from tpudet.models.vgg import VGG16_STAGES

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        return np.asarray(v, np.float32)

    params: Dict = {}
    idx = 0
    for stage, (n_convs, _ch) in enumerate(VGG16_STAGES, start=1):
        p: Dict = {}
        for i in range(1, n_convs + 1):
            p[f"conv{stage}_{i}"] = {
                "kernel": np.transpose(
                    arr(f"features.{idx}.weight"), (2, 3, 1, 0)
                ),
                "bias": arr(f"features.{idx}.bias"),
            }
            idx += 2  # conv + relu
        params[f"stage{stage}"] = p
        idx += 1  # maxpool
    return params, {}


def convert_torch_vit(
    state_dict: Dict[str, Any], pos_grid: int = 64
) -> Tuple[Dict, Dict]:
    """timm/MAE-layout plain-ViT state dict -> (params, {}) for the ViTDet
    backbone (``models/vit.py``; constants is empty — no frozen norms).

    Layout (timm ``vit_*_patch16_*`` / the MAE release):
    ``patch_embed.proj.{weight,bias}`` ([D, 3, p, p] -> [p, p, 3, D]);
    ``pos_embed`` [1, (1+)g*g, D] — a leading cls token is DROPPED
    (detection uses only grid tokens) and the grid is bilinearly resized to
    ``pos_grid`` (the model resizes again to the canvas grid at trace
    time, so the parameter grid is a free choice);
    ``blocks.{i}.attn.qkv.{weight,bias}`` — the fused [3D, D] projection
    splits into the model's separate query/key/value Dense layers (row
    blocks [0:D], [D:2D], [2D:3D]; torch Linear weights are [out, in] ->
    transposed); ``attn.proj`` -> ``attn/out``; ``mlp.fc{1,2}`` ->
    ``mlp_fc{1,2}``; ``norm{1,2}``/final ``norm`` -> LayerNorm
    {scale, bias}.
    """

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        return np.asarray(v, np.float32)

    def lin(key):
        return {"kernel": np.transpose(arr(key + ".weight")),
                "bias": arr(key + ".bias")}

    def ln(key):
        return {"scale": arr(key + ".weight"), "bias": arr(key + ".bias")}

    pw = arr("patch_embed.proj.weight")           # [D, 3, p, p]
    d = pw.shape[0]
    params: Dict = {
        "patch_embed": {
            "kernel": np.transpose(pw, (2, 3, 1, 0)),
            "bias": arr("patch_embed.proj.bias"),
        },
    }

    pos = arr("pos_embed")                        # [1, (1+)N, D]
    n = pos.shape[1]
    g = int(math.isqrt(n))
    if g * g != n:
        if int(math.isqrt(n - 1)) ** 2 == n - 1:  # leading cls token
            pos = pos[:, 1:]
            g = int(math.isqrt(n - 1))
        else:
            raise ValueError(f"pos_embed length {n} is not a square grid")
    pos = pos.reshape(1, g, g, d)
    if g != pos_grid:
        import jax

        pos = np.asarray(jax.image.resize(
            jnp_asarray_f32(pos), (1, pos_grid, pos_grid, d), "bilinear"
        ))
    params["pos_embed"] = pos

    i = 0
    while f"blocks.{i}.norm1.weight" in state_dict:
        qkv_w = np.transpose(arr(f"blocks.{i}.attn.qkv.weight"))  # [D, 3D]
        qkv_b = arr(f"blocks.{i}.attn.qkv.bias")                  # [3D]
        attn = {
            "query": {"kernel": qkv_w[:, :d], "bias": qkv_b[:d]},
            "key": {"kernel": qkv_w[:, d:2 * d], "bias": qkv_b[d:2 * d]},
            "value": {"kernel": qkv_w[:, 2 * d:], "bias": qkv_b[2 * d:]},
            "out": lin(f"blocks.{i}.attn.proj"),
        }
        params[f"block{i}"] = {
            "norm1": ln(f"blocks.{i}.norm1"),
            "attn": attn,
            "norm2": ln(f"blocks.{i}.norm2"),
            "mlp_fc1": lin(f"blocks.{i}.mlp.fc1"),
            "mlp_fc2": lin(f"blocks.{i}.mlp.fc2"),
        }
        i += 1
    params["norm"] = ln("norm")
    return params, {}


def jnp_asarray_f32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.float32)


def save_backbone_npz(path: str, params: Dict, constants: Dict) -> None:
    flat = {}

    def put(prefix, tree):
        for key, value in tree.items():
            if isinstance(value, dict):
                put(f"{prefix}{key}/", value)
            else:
                flat[f"{prefix}{key}"] = value

    put("params/", params)
    put("constants/", constants)
    np.savez(path, **flat)


def load_backbone_npz(path: str) -> Tuple[Dict, Dict]:
    blob = np.load(path)
    params: Dict = {}
    constants: Dict = {}
    for key in blob.files:
        parts = key.split("/")
        root = params if parts[0] == "params" else constants
        node = root
        for part in parts[1:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = blob[key]
    return params, constants


def apply_backbone_weights(variables: Dict, params: Dict, constants: Dict) -> Dict:
    """Merge converted backbone weights into a FasterRCNN variables tree,
    validating shapes. Returns a new variables dict."""
    import jax

    def merge(dst, src, path=""):
        out = dict(dst)
        for key, value in src.items():
            if key not in dst:
                raise KeyError(f"no parameter {path + key!r} in model")
            if isinstance(value, dict):
                out[key] = merge(dst[key], value, path + key + "/")
            else:
                have = np.shape(dst[key])
                want = np.shape(value)
                if tuple(have) != tuple(want):
                    raise ValueError(
                        f"shape mismatch at {path + key}: model {have}, import {want}"
                    )
                out[key] = np.asarray(value, np.float32)
        return out

    new_vars = {k: dict(v) for k, v in variables.items()}
    new_vars["params"] = dict(new_vars["params"])
    new_vars["params"]["backbone"] = merge(
        variables["params"]["backbone"], params, "params/backbone/"
    )
    if constants:
        if "constants" not in variables:
            raise ValueError(
                "checkpoint carries frozen-BN constants but the model has no "
                "'constants' collection — it was built with norm="
                "'gn'; use BackboneConfig(norm='frozen_bn') to import "
                "pretrained BN statistics"
            )
        new_vars["constants"] = dict(new_vars["constants"])
        new_vars["constants"]["backbone"] = merge(
            variables["constants"]["backbone"], constants, "constants/backbone/"
        )
    return jax.tree_util.tree_map(lambda x: x, new_vars)
