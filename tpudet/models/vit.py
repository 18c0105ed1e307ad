"""ViTDet: plain Vision Transformer detection backbone + simple feature
pyramid (Li et al., "Exploring Plain Vision Transformer Backbones for
Object Detection", arXiv:2203.16527). A build extra beyond the conv-only
TF2 reference: the backbone family that runs detection's feature
extraction on the MXU's native workload — large batched attention and MLP
matmuls — instead of convolutions.

TPU-first design notes:
  * Window attention is a pure reshape: the [B, Hp, Wp, D] token grid pads
    statically to window multiples and reshapes to [B*nW, w*w, D] — no
    gather, no masks, every attention matmul is a dense MXU contraction at
    one static shape shared by all windows. Every ``global_attn_every``-th
    block attends over the full grid (the paper's cross-window propagation;
    §4.1 finds four evenly-spaced global blocks suffice).
  * The simple feature pyramid (paper §3, Fig. 1 right) builds p2–p6 from
    the SINGLE stride-16 map by per-level deconv/identity/maxpool — no
    lateral/top-down pathway at all (the paper's central claim: FPN's
    hierarchy is unnecessary for a plain backbone). Output contract is the
    same ``{"p2".."p6"}``/256-channel dict as ``models.fpn.FPN``, so RPN,
    per-level proposals, the windowed RoI pooler, and every R-CNN family
    head run unchanged on top.
  * Positional embedding is a fixed-grid parameter resized to the canvas
    grid at trace time (bilinear, f32) — checkpoints are canvas-independent
    and aspect-bucketed loaders just retrace per bucket like the conv path.
  * Attention softmax accumulates in f32; LayerNorms run in f32 (params and
    compute) with the block compute dtype (bf16 tier) around them.

Padding note (deliberate, matches upstream ViTDet behavior): canvas-pad
tokens participate in attention — the original implementation also pads
batch images to a common size and attends over the padding. Features in
the valid region therefore depend (weakly) on the canvas bucket, unlike
the conv backbones whose frozen-norm features are positionally local; the
canvas-invariance guarantees documented for the deformable-DETR family do
NOT extend to ViTDet, by upstream-faithful choice.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# name -> (embed dim, depth, heads). Paper table 1 variants + a test tiny.
VIT_VARIANTS = {
    "vit_s": (384, 12, 6),
    "vit_b": (768, 12, 12),
    "vit_l": (1024, 24, 16),
    "vit_tiny": (32, 2, 2),
}


class Attention(nn.Module):
    """Standard MHA over [N, L, D] token blocks; f32 softmax.

    q/k/v/out are separate [D, D] Dense layers (not one fused [D, 3D]
    qkv): the column axis then reshapes to (heads, head_dim) with heads
    outermost, so the Megatron TP rules in
    ``parallel/sharding_rules.py`` shard each projection at a head
    boundary whenever the model axis divides ``heads`` — each shard runs
    its own heads' attention end-to-end with the single per-block
    all-reduce on the row-parallel ``out`` projection."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, l, _ = x.shape
        hd = self.dim // self.heads

        def proj(name):
            y = nn.Dense(self.dim, dtype=self.dtype, name=name)(x)
            return y.reshape(n, l, self.heads, hd)

        q, k, v = proj("query"), proj("key"), proj("value")
        logits = jnp.einsum(
            "nqhd,nkhd->nhqk", q, k,
            preferred_element_type=jnp.float32,
        ) * (hd ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "nhqk,nkhd->nqhd", attn.astype(self.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.reshape(n, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


def _window_partition(x: jnp.ndarray, w: int):
    """[B, H, W, D] -> ([B*nH*nW, w*w, D], padded (H, W)). Static pad to
    window multiples; pure reshapes otherwise."""
    b, h, wd, d = x.shape
    ph, pw = (-h) % w, (-wd) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, wd + pw
    x = x.reshape(b, hp // w, w, wp // w, w, d)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, d)
    return x, (hp, wp)


def _window_unpartition(x: jnp.ndarray, w: int, hw_pad: Tuple[int, int],
                        hw: Tuple[int, int], batch: int) -> jnp.ndarray:
    hp, wp = hw_pad
    d = x.shape[-1]
    x = x.reshape(batch, hp // w, wp // w, w, w, d)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(batch, hp, wp, d)
    return x[:, : hw[0], : hw[1], :]


class Block(nn.Module):
    """Pre-LN transformer block; window or global attention."""

    dim: int
    heads: int
    window: int          # 0 = global attention
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, d = x.shape
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        if self.window > 0:
            y, hw_pad = _window_partition(y, self.window)
            y = Attention(self.dim, self.heads, self.dtype, name="attn")(y)
            y = _window_unpartition(y, self.window, hw_pad, (h, w), b)
        else:
            y = y.reshape(b, h * w, d)
            y = Attention(self.dim, self.heads, self.dtype, name="attn")(y)
            y = y.reshape(b, h, w, d)
        x = shortcut + y
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        y = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # exact erf: the timm/MAE convention (import parity)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class ViT(nn.Module):
    """Plain ViT backbone: 16x16 patchify conv -> ``depth`` blocks ->
    final LN; returns ``{"plain": [B, H/16, W/16, dim]}`` for
    :class:`SimpleFeaturePyramid`.

    ``freeze_stem`` stops gradients through the patch embedding + position
    embedding (the analog of the conv backbones' frozen stem, for
    fine-tuning imported weights)."""

    dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 16
    window: int = 14
    # Every k-th block (1-indexed; i.e. blocks k-1, 2k-1, ...) attends
    # globally. depth=12, k=3 -> blocks 2, 5, 8, 11: the paper's four
    # evenly-spaced global blocks.
    global_attn_every: int = 3
    # Side of the square positional-embedding parameter grid; resized
    # bilinearly to the canvas token grid at trace time.
    pos_grid: int = 64
    dtype: Any = jnp.float32
    freeze_stem: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(
                f"ViT backbone needs canvas dims divisible by patch size "
                f"{self.patch}, got {(h, w)}"
            )
        x = nn.Conv(
            self.dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        hp, wp = x.shape[1], x.shape[2]

        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self.pos_grid, self.pos_grid, self.dim),
        )
        if (hp, wp) != (self.pos_grid, self.pos_grid):
            pos = jax.image.resize(
                pos.astype(jnp.float32), (1, hp, wp, self.dim), "bilinear"
            )
        x = x + pos.astype(self.dtype)
        if self.freeze_stem:
            x = jax.lax.stop_gradient(x)

        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            is_global = (i + 1) % self.global_attn_every == 0
            x = block_cls(
                self.dim, self.heads,
                0 if is_global else self.window,
                dtype=self.dtype, name=f"block{i}",
            )(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        return {"plain": x}


class SimpleFeaturePyramid(nn.Module):
    """Paper §3/A.2: per-level scale transforms of the single stride-16 map
    (x4: two stride-2 deconvs with LN+GELU between; x2: one deconv; x1:
    identity; x0.5: stride-2 maxpool), each followed by 1x1 conv + LN +
    3x3 conv + LN to ``channels``; p6 = stride-2 pool of p5 (the same RPN
    coverage extension as ``FPN``)."""

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        x = feats["plain"]
        d = x.shape[-1]

        def ln(y, name):
            return nn.LayerNorm(dtype=jnp.float32, name=name)(
                y.astype(jnp.float32)
            ).astype(self.dtype)

        # Scale transforms off the shared map.
        up2 = nn.ConvTranspose(
            d // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="up4_deconv1",
        )(x)
        up4 = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="up4_deconv2",
        )(nn.gelu(ln(up2, "up4_ln"), approximate=False))
        scaled = {
            "p2": up4,
            "p3": nn.ConvTranspose(
                d // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                name="up2_deconv",
            )(x),
            "p4": x,
            # Paper §A.2 / detectron2 SimpleFeaturePyramid: a real 2x2
            # stride-2 max pool for the 1/2-scale map. SAME padding keeps
            # the ceil(H/2) output contract for odd grids (identical to
            # VALID on the even patch grids the presets produce).
            "p5": nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME"),
        }
        outs = {}
        for name, y in scaled.items():
            y = nn.Conv(
                self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                name=f"{name}_proj",
            )(y)
            y = ln(y, f"{name}_proj_ln")
            y = nn.Conv(
                self.channels, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"{name}_out",
            )(y)
            outs[name] = ln(y, f"{name}_out_ln")
        outs["p6"] = nn.max_pool(
            outs["p5"], (1, 1), strides=(2, 2), padding="VALID"
        )
        return outs


def build_vit(name: str, cfg, dtype: Any) -> ViT:
    """Backbone factory for ``backbone.name in VIT_VARIANTS`` — ``cfg`` is
    the BackboneConfig (window/global/pos-grid knobs are ``vit_*`` fields
    there)."""
    dim, depth, heads = VIT_VARIANTS[name]
    return ViT(
        dim=dim, depth=depth, heads=heads,
        window=cfg.vit_window,
        global_attn_every=cfg.vit_global_attn_every,
        pos_grid=cfg.vit_pos_grid,
        dtype=dtype,
        freeze_stem=cfg.freeze_stem,
        remat=cfg.remat,
    )
