"""ResNet backbones, NHWC (SURVEY.md C5; reference uses a Keras-applications
ResNet-50 at stride 16 — here rebuilt as Flax linen, TPU layout-optimal).

Returns a pyramid dict {"c2": s4, "c3": s8, "c4": s16, "c5": s32}; the
single-scale Faster R-CNN consumes "c4" (stride 16, as the reference does),
FPN consumes all levels. Convs run in ``dtype`` (bf16 option keeps the MXU at
double rate); params stay float32 and outputs are cast back by callers as
needed.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudet.models.layers import make_norm

STAGE_BLOCKS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}
# Basic-block (3x3->3x3) variants; the rest are bottlenecks.
BASIC_BLOCK = {"resnet18", "resnet34"}


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/b, W/b, b*b*C] (NHWC, row-major block order)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // block, w // block, block * block * c
    )


def stem_kernel_to_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """Transform the standard [7, 7, C, 64] stride-2 stem-conv kernel into the
    exactly equivalent [4, 4, 4*C, 64] stride-1 kernel applied to the
    block-2 space-to-depth input.

    Derivation: pad the 7x7 taps to 8x8 on the top/left (one zero row/col) so
    every tap index u in [-4, 3] splits as u = 2k + a - 4 with k in [0, 4),
    a in {0, 1}; taps then regroup over the s2d channel axis (a, b, c)."""
    kh, kw, c, o = kernel.shape
    assert (kh, kw) == (7, 7), kernel.shape
    pad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8, 8, C, O]
    # [8=2k+a, 8=2l+b, C, O] -> [k, a, l, b, C, O] -> [k, l, (a, b, C), O]
    k4 = pad.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return k4.reshape(4, 4, 4 * c, o)


def convert_params_to_s2d(params):
    """Rewrite a standard-stem ResNet param tree for ``s2d_stem=True``."""
    import flax

    params = flax.core.unfreeze(params)
    params["stem_conv"] = dict(
        params["stem_conv"],
        kernel=stem_kernel_to_s2d(params["stem_conv"]["kernel"]),
    )
    return params


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut on shape change.

    ``stride_in_1x1=True`` puts the downsampling stride on the first 1x1 conv
    (the original/Keras/caffe ResNet-50 — what the TF2 reference uses via
    ``keras.applications``; required for pretrained-weight import parity);
    False puts it on the 3x3 ("v1.5"/torchvision convention).
    """

    channels: int  # output channels (4x the bottleneck width)
    stride: int
    norm: str
    dtype: Any
    stride_in_1x1: bool = True

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm, self.dtype)
        width = self.channels // 4
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        shortcut = x
        if x.shape[-1] != self.channels or self.stride != 1:
            shortcut = nn.Conv(
                self.channels, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="conv_proj",
            )(x)
            shortcut = norm(name="norm_proj")(shortcut)

        y = nn.Conv(width, (1, 1), strides=s1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm(name="norm1")(y))
        y = nn.Conv(
            width, (3, 3), strides=s3, padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(norm(name="norm2")(y))
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm(name="norm3")(y)
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (ResNet-18/34). Projection shortcut on
    shape change; the downsampling stride sits on the first 3x3 in every
    convention (no stride_in_1x1 question for basic blocks — the kwarg is
    accepted and ignored so ResNet can construct either block uniformly)."""

    channels: int
    stride: int
    norm: str
    dtype: Any
    stride_in_1x1: bool = True  # inapplicable; uniform ctor with Bottleneck

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm, self.dtype)
        shortcut = x
        if x.shape[-1] != self.channels or self.stride != 1:
            shortcut = nn.Conv(
                self.channels, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="conv_proj",
            )(x)
            shortcut = norm(name="norm_proj")(shortcut)
        y = nn.Conv(
            self.channels, (3, 3), strides=self.stride,
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(norm(name="norm1")(y))
        y = nn.Conv(
            self.channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = norm(name="norm2")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """ResNet-18/34/50/101. ``freeze_stem`` stops gradients through the stem
    and first stage (Faster R-CNN §3.2 fine-tuning practice)."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    freeze_stem: bool = True
    # Downsampling-stride placement (see Bottleneck): True = original/Keras/
    # caffe (the reference's keras.applications weights), False = the
    # torchvision "v1.5" convention (required for torch-weight import).
    stride_in_1x1: bool = True
    # Replace the 7x7/s2 stem conv with an exactly equivalent 4x4/s1 conv on
    # a block-2 space-to-depth input. The standard stem has 3 input channels,
    # which starves the MXU (128-wide contraction) and forces a strided conv;
    # the s2d form is a dense 12-channel stride-1 conv at quarter resolution.
    # Weights interconvert via ``stem_kernel_to_s2d`` (same math, bit-level
    # tolerance); KERNELS.md has the measurement.
    s2d_stem: bool = False
    # Rematerialize each bottleneck block on the backward pass
    # (jax.checkpoint): activations are recomputed instead of stored, cutting
    # peak training HBM roughly by the backbone-activation term — the
    # standard TPU trade of MXU FLOPs for HBM capacity to fit bigger
    # per-chip batches. No effect on values (tested) or on inference.
    remat: bool = False
    # Basic (3x3->3x3, ResNet-18/34) vs bottleneck blocks; sets the stage
    # widths too (64..512 vs 256..2048).
    basic: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        x = x.astype(self.dtype)

        # Stem: 7x7/2 + maxpool 3x3/2 -> stride 4.
        if self.s2d_stem:
            x = space_to_depth(x, 2)
            x = nn.Conv(
                64, (4, 4), strides=1, padding=[(2, 1), (2, 1)],
                use_bias=False, dtype=self.dtype, name="stem_conv",
            )(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="stem_conv",
            )(x)
        x = nn.relu(norm(name="norm_stem")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        channels = (64, 128, 256, 512) if self.basic else (256, 512, 1024, 2048)
        base_cls = BasicBlock if self.basic else Bottleneck
        block_cls = nn.remat(base_cls) if self.remat else base_cls
        for stage, (n_blocks, ch) in enumerate(zip(self.blocks, channels)):
            for i in range(n_blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = block_cls(
                    ch, stride, self.norm, self.dtype,
                    stride_in_1x1=self.stride_in_1x1,
                    name=f"stage{stage + 2}_block{i}",
                )(x)
            if stage == 0 and self.freeze_stem:
                x = jax.lax.stop_gradient(x)
            feats[f"c{stage + 2}"] = x
        return feats


class TinyBackbone(nn.Module):
    """Small conv net to stride 32 for fast CPU tests; same pyramid contract."""

    width: int = 32
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (3, 3), strides=2, dtype=self.dtype)(x)  # s2
        x = nn.relu(norm()(x))
        feats = {}
        for i, name in enumerate(["c2", "c3", "c4", "c5"]):  # s4, s8, s16, s32
            x = nn.Conv(self.width, (3, 3), strides=2, dtype=self.dtype)(x)
            x = nn.relu(norm()(x))
            feats[name] = x
        return feats


def build_backbone(name: str, norm: str, dtype: Any, freeze_stem: bool,
                   s2d_stem: bool = False, remat: bool = False,
                   stride_in_1x1: bool = True) -> nn.Module:
    if name == "tiny":
        # Honor the requested norm (frozen_bn is identity at random init but
        # positionally LOCAL, which canvas-invariance tests rely on; GN folds
        # padding pixels into its statistics).
        return TinyBackbone(norm=norm, dtype=dtype)
    if name in STAGE_BLOCKS:
        return ResNet(
            blocks=STAGE_BLOCKS[name], norm=norm, dtype=dtype,
            freeze_stem=freeze_stem, s2d_stem=s2d_stem, remat=remat,
            stride_in_1x1=stride_in_1x1, basic=name in BASIC_BLOCK,
        )
    if name == "vgg16":
        from tpudet.models.vgg import VGG

        # VGG has no norm layers and no stem variants; those knobs are
        # inapplicable rather than configurable.
        return VGG(dtype=dtype, freeze_stem=freeze_stem, remat=remat)
    raise ValueError(f"unknown backbone {name!r}")


def backbone_channels(name: str, width: int = 32) -> Dict[str, int]:
    if name == "tiny":
        return {"c2": width, "c3": width, "c4": width, "c5": width}
    if name == "vgg16":
        return {"c2": 256, "c3": 512, "c4": 512, "c5": 512}
    if name in BASIC_BLOCK:
        return {"c2": 64, "c3": 128, "c4": 256, "c5": 512}
    return {"c2": 256, "c3": 512, "c4": 1024, "c5": 2048}
