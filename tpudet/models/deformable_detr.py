"""Deformable DETR assembly (Zhu et al., arXiv:2010.04159 — a build extra
beyond the TF2 reference's convolutional pipeline, and the second
set-prediction family after ``models/detr.py``).

What it changes vs DETR, and why it matters on TPU:

- **Multi-scale deformable attention** (``ops/deform_attn.py``) replaces
  dense attention: each query samples ``points`` bilinear locations per
  head per level instead of attending to every token. Complexity drops
  from O(N²) to O(N·H·L·P), which is what makes MULTI-SCALE features
  (C3..C5 + an extra stride-64 level — 20x the C5 token count) affordable;
  small objects stop being a single C5 pixel.
- **Focal-matched set loss** (``train/losses.py::deformable_detr_set_loss``):
  per-class sigmoids + focal loss replace softmax + the no-object column,
  with the focal-style matching cost from the paper's appendix A.4.
- **Reference points + relative box regression**: every query carries a
  normalized reference point; boxes regress as offsets through
  ``inverse_sigmoid`` around it. With ``with_box_refine`` each decoder
  layer re-estimates the box from the previous layer's (detached) output —
  per-layer heads, the paper's iterative refinement.

TPU-first invariants shared with DETR: the bipartite matching runs INSIDE
the jitted step (exact Jonker–Volgenant, ``ops/hungarian.py``); geometry is
canvas-padding-invariant — positional embeddings normalize over each
image's true extent, and sampling coordinates are expressed relative to the
valid extent then scaled by per-level valid ratios (the official
implementation's ``valid_ratios`` formulation), so the aspect bucket a
batch lands in cannot change any sampled feature. Boxes are normalized by
the TRUE image extent, matching the framework's DETR convention.

Same ``init`` / ``loss`` / ``predict`` surface and batch/detection dict
contracts as every other family, so the trainer/evaluator/serving/CLIs
stay model-agnostic via ``models.build_model``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudet.config import Config
from tpudet.models.detr import _FFN, sine_position_embedding
from tpudet.models.resnet import build_backbone
from tpudet.ops import boxes as box_ops
from tpudet.ops.deform_attn import (
    inverse_sigmoid,
    level_reference_points,
    ms_deform_attn_batched,
    ms_deform_attn_patch,
    sampling_offset_init_bias,
)
from tpudet.train import losses as L


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module (paper §4.1): offsets and
    attention weights are linear in the query; the value projection is
    linear in the flattened multi-scale memory; sampling runs through the
    fused XLA gather in ``ops/deform_attn.py``.

    Init matches the official implementation: offset kernel zero with the
    directional-probe bias (head k looks along 2πk/H at radius p+1),
    attention-weight layer zero (uniform after softmax), so training starts
    from a well-conditioned local average around the reference point."""

    d_model: int
    num_heads: int
    num_levels: int
    num_points: int
    dtype: Any
    # Gather formulation for the bilinear sampling — "flat" (one rank-2
    # embedding-style lookup, one row per corner) or "patch" (one 2x2
    # corner patch per sample: 4x fewer indices, full-lane rows — the TPU
    # gather cost model is per-index, KERNELS.md "Deformable attention,
    # part 2"). Exact-equivalent; chip-adjudicated default in config.
    gather: str = "flat"
    # Share sampling locations across heads (Lite-DETR-style efficiency
    # variant): offsets lose their head axis, the gather fetches all heads'
    # channels per index (4*H x fewer indices), attention weights stay
    # per-head. A MODEL change (different parameter shapes), so it is a
    # config choice, never a silent default. Requires gather="patch".
    shared_locations: bool = False
    mxu_query_tile: int = 128

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,        # [B, Nq, d]
        ref_xy: jnp.ndarray,       # [B, Nq, L, 2] full-grid-normalized (x, y)
        ref_wh: jnp.ndarray | None,  # [B, Nq, L, 2] box (w, h) in the same
                                     # frame, or None for point references
        memory: jnp.ndarray,       # [B, N, d] flattened multi-scale tokens
        valid_tokens: jnp.ndarray,  # [B, N] bool — padded tokens' VALUES are
                                    # zeroed (the official implementation's
                                    # masked_fill), so a sample landing on
                                    # canvas padding contributes exactly what
                                    # an out-of-grid sample does: nothing.
                                    # This is what keeps geometry invariant
                                    # to the aspect bucket.
        level_shapes: Tuple[Tuple[int, int], ...],
    ) -> jnp.ndarray:
        h, lv, p = self.num_heads, self.num_levels, self.num_points
        head_dim = self.d_model // h
        b, nq, _ = query.shape

        if self.shared_locations and self.gather != "patch":
            raise ValueError(
                "shared_locations requires the patch gather formulation"
            )
        value = nn.Dense(self.d_model, dtype=self.dtype, name="value")(
            memory
        )
        value = jnp.where(valid_tokens[..., None], value, 0.0)
        value = value.reshape(b, -1, h, head_dim)
        if self.shared_locations:
            # Head-free offsets; the directional probe spreads the P points
            # over angles 2πk/P at radius 1 (the per-head probe's role —
            # break the zero-init symmetry — with the head axis gone).
            probe = sampling_offset_init_bias(p, lv, 1).reshape(p, lv, 2)
            shared_bias = jnp.transpose(probe, (1, 0, 2)).reshape(-1)
            offsets = nn.Dense(
                lv * p * 2, dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: (
                    shared_bias.astype(dtype)
                ),
                name="sampling_offsets",
            )(query.astype(jnp.float32)).reshape(b, nq, lv, p, 2)
        else:
            offsets = nn.Dense(
                h * lv * p * 2, dtype=jnp.float32,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: (
                    sampling_offset_init_bias(h, lv, p).astype(dtype)
                ),
                name="sampling_offsets",
            )(query.astype(jnp.float32)).reshape(b, nq, h, lv, p, 2)
        attn = nn.Dense(
            h * lv * p, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query.astype(jnp.float32)).reshape(b, nq, h, lv * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(b, nq, h, lv, p)

        # Reference broadcast: head axis at dim 2 for per-head offsets,
        # absent entirely in the shared layout ([B, Nq, L, P, 2]).
        if self.shared_locations:
            ref_b = ref_xy[:, :, :, None, :]
            wh_b = None if ref_wh is None else ref_wh[:, :, :, None, :]
        else:
            ref_b = ref_xy[:, :, None, :, None, :]
            wh_b = (
                None if ref_wh is None else ref_wh[:, :, None, :, None, :]
            )
        if ref_wh is None:
            # Point reference: offsets are in PIXELS of each level's grid
            # (paper: divided by the level's (W, H) to normalize).
            normalizer = jnp.array(
                [[wl, hl] for hl, wl in level_shapes], jnp.float32
            )                                          # [L, 2] as (W, H)
            norm_b = (
                normalizer[None, None, :, None, :]
                if self.shared_locations
                else normalizer[None, None, None, :, None, :]
            )
            loc = ref_b + offsets / norm_b
        else:
            # Box reference (iterative refinement): offsets are relative to
            # the box size — offset/P * (w, h)/2 (official formulation).
            loc = ref_b + offsets / p * wh_b * 0.5
        # Whole-batch formulation (NOT vmap(ms_deform_attn)): the vmapped
        # gather's batching dims trip XLA's TPU gather expander into a
        # one-hot contraction — a 30 GB HBM OOM at the COCO b=16 decoder
        # (see ops/deform_attn.py::ms_deform_attn_batched).
        if self.gather == "mxu":
            # One-hot MXU kernel (kernels/deform_attn_mxu.py) on TPU
            # lowering; the flat gather is its exact-math fallback
            # elsewhere (CPU tests, mixed-platform exports) — the same
            # dispatch policy as every kernel in tpudet.kernels.
            from tpudet import kernels as K
            from tpudet.kernels.deform_attn_mxu import ms_deform_attn_mxu

            if K.on_tpu_lowering():
                out = ms_deform_attn_mxu(
                    value, level_shapes, locations=loc, weights=attn,
                    query_tile=self.mxu_query_tile,
                )
            else:
                out = ms_deform_attn_batched(
                    value, level_shapes, locations=loc, weights=attn,
                )
        elif self.gather == "patch":
            out = ms_deform_attn_patch(
                value, level_shapes, locations=loc, weights=attn,
            )
        else:
            out = ms_deform_attn_batched(
                value,            # gathered in the value dtype (bf16-safe):
                level_shapes,     # this op is HBM-gather-bound, and the
                locations=loc,    # f32 reduction happens inside the einsum
                weights=attn,
            )                                          # [B, Nq, H, head_dim]
        out = out.reshape(b, nq, self.d_model).astype(self.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out")(out)


class DeformableEncoderLayer(nn.Module):
    """Post-norm encoder layer: deformable self-attention over the
    multi-scale token sequence (query = token + positional/level embedding,
    reference = the token's own center), then FFN."""

    d_model: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_dim: int
    dropout: float
    dtype: Any
    gather: str = "flat"
    shared_locations: bool = False
    mxu_query_tile: int = 128

    @nn.compact
    def __call__(self, src, pos, ref_xy, valid_tokens, level_shapes,
                 deterministic: bool):
        attn = MSDeformAttn(
            self.d_model, self.num_heads, self.num_levels, self.num_points,
            self.dtype, self.gather, self.shared_locations,
            self.mxu_query_tile, name="deform_attn",
        )(src + pos, ref_xy, None, src, valid_tokens, level_shapes)
        src = nn.LayerNorm(name="norm1")(
            src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ffn = _FFN(self.d_model, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(src, deterministic)
        return nn.LayerNorm(name="norm2")(
            src + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        )


class DeformableDecoderLayer(nn.Module):
    """Post-norm decoder layer: dense query self-attention (queries are few
    — deformable buys nothing there), deformable cross-attention into the
    multi-scale memory, FFN."""

    d_model: int
    num_heads: int
    num_levels: int
    num_points: int
    ffn_dim: int
    dropout: float
    dtype: Any
    gather: str = "flat"
    shared_locations: bool = False
    mxu_query_tile: int = 128

    @nn.compact
    def __call__(self, tgt, query_pos, memory, ref_xy, ref_wh,
                 valid_tokens, level_shapes, deterministic: bool):
        q = tgt + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, dtype=self.dtype, name="self_attn",
        )(q, q, tgt, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        attn = MSDeformAttn(
            self.d_model, self.num_heads, self.num_levels, self.num_points,
            self.dtype, self.gather, self.shared_locations,
            self.mxu_query_tile, name="cross_attn",
        )(tgt + query_pos, ref_xy, ref_wh, memory, valid_tokens,
          level_shapes)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ffn = _FFN(self.d_model, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(tgt, deterministic)
        return nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        )


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics are computed over VALID positions only
    (canvas padding excluded). Stock GroupNorm folds padded pixels into its
    mean/variance, making every projected feature depend on the aspect
    bucket the batch landed in — this variant keeps the projections
    positionally local, which the family's canvas-invariance contract
    (and its end-to-end test) requires. torch-compatible eps."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, valid):      # x [B, H, W, C], valid [B, H, W]
        b, h, w, c = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
        m = valid.reshape(b, h * w, 1, 1).astype(jnp.float32)
        n = jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True) * (c // g), 1.0
        )                                           # [B, 1, 1, 1] per group
        mean = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / n
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True) / n
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(b, h, w, c)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (y * scale + bias).astype(x.dtype)


class _BoxMLP(nn.Module):
    """3-layer box head (d -> d -> d -> 4), the paper's MLP."""

    d_model: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(
            4, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="out",
        )(x.astype(jnp.float32))


class DeformableDETRCore(nn.Module):
    """Backbone C3..C5 (+ extra strided levels) -> per-level projections ->
    deformable encoder -> deformable decoder -> per-layer heads.

    Returns per-decoder-layer ``[Ldec, B, Q, C]`` sigmoid class logits and
    ``[Ldec, B, Q, 4]`` (cx, cy, w, h) boxes normalized by each image's
    TRUE extent — layer -1 is the model output, earlier layers feed the
    auxiliary losses."""

    cfg: Config

    def setup(self):
        bb = self.cfg.backbone
        d = self.cfg.deformable_detr
        dtype = jnp.bfloat16 if bb.dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        self.backbone = build_backbone(
            bb.name, bb.norm, dtype, bb.freeze_stem, s2d_stem=bb.s2d_stem,
            remat=bb.remat, stride_in_1x1=bb.stride_in_1x1,
        )
        # Per-level input projections: 1x1 conv + masked GroupNorm(32) on
        # C3..C5; extra levels via 3x3/s2 conv on the previous one (paper
        # §4.3 — the first extra level convolves the raw C5). The extra
        # convs use explicit (1, 1) padding, NOT "SAME": SAME's pad split
        # depends on the input parity (an odd C5 pads a zero row on top, an
        # even one does not), which would misalign the stride-64 grid
        # between aspect buckets and break canvas invariance. With (1, 1)
        # the first output window always starts at input row -1 regardless
        # of canvas size.
        groups = min(32, d.d_model)
        self.input_proj = [
            nn.Conv(d.d_model, (1, 1), dtype=dtype, name=f"input_proj{i}")
            for i in range(3)
        ]
        self.input_norm = [
            MaskedGroupNorm(groups, name=f"input_norm{i}") for i in range(3)
        ]
        self.extra_proj = [
            nn.Conv(d.d_model, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=dtype, name=f"extra_proj{i}")
            for i in range(d.num_levels - 3)
        ]
        self.extra_norm = [
            MaskedGroupNorm(groups, name=f"extra_norm{i}")
            for i in range(d.num_levels - 3)
        ]
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (d.num_levels, d.d_model), jnp.float32,
        )
        mk = functools.partial(
            dict, d_model=d.d_model, num_heads=d.num_heads,
            num_levels=d.num_levels, num_points=d.num_points,
            ffn_dim=d.ffn_dim, dropout=d.dropout, dtype=dtype,
            gather=d.sampling_gather,
            shared_locations=d.shared_sampling_locations,
            mxu_query_tile=d.mxu_query_tile,
        )
        self.encoder = [
            DeformableEncoderLayer(**mk(), name=f"enc{i}")
            for i in range(d.enc_layers)
        ]
        self.decoder = [
            DeformableDecoderLayer(**mk(), name=f"dec{i}")
            for i in range(d.dec_layers)
        ]
        # Queries carry (positional embedding, content init) halves; the
        # initial reference point is linear in the positional half.
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (d.num_queries, 2 * d.d_model), jnp.float32,
        )
        self.ref_point_head = nn.Dense(
            2, dtype=jnp.float32, name="ref_point_head"
        )
        # Per-layer heads under box refinement (each layer re-estimates the
        # box around the previous estimate); shared heads otherwise.
        import math as _math

        prior_bias = -_math.log((1.0 - 0.01) / 0.01)  # focal prior P=0.01
        n_heads = d.dec_layers if d.with_box_refine else 1
        self.class_heads = [
            nn.Dense(
                self.cfg.data.num_classes, dtype=jnp.float32,
                bias_init=nn.initializers.constant(prior_bias),
                name=f"class_head{i}",
            )
            for i in range(n_heads)
        ]
        self.bbox_heads = [
            _BoxMLP(d.d_model, dtype, name=f"bbox_head{i}")
            for i in range(n_heads)
        ]

    # ------------------------------------------------------------ features
    def _multi_scale(self, images, image_hw):
        """Backbone -> L projected levels + per-level validity masks,
        positional embeddings, shapes, and valid ratios."""
        d = self.cfg.deformable_detr
        feats = self.backbone(images)
        maps = [
            proj(feats[name])
            for proj, name in zip(self.input_proj, ("c3", "c4", "c5"))
        ]
        x = feats["c5"]
        for proj in self.extra_proj:
            x = proj(x)
            maps.append(x)
        norms = list(self.input_norm) + list(self.extra_norm)

        level_shapes, tokens, poss, valids = [], [], [], []
        ratios = []
        b = images.shape[0]
        for li, m in enumerate(maps):
            _, hf, wf, _ = m.shape
            level_shapes.append((hf, wf))
            # The TRUE architectural stride (C3 = 8, doubling per level) —
            # NOT ceil(canvas / dim): an extra level need not exactly tile
            # the canvas (e.g. 3 stride-64 rows cover 192 px of a 160-px
            # canvas), and a ceil-derived pseudo-stride would misplace the
            # validity cutoff and the valid ratios between aspect buckets.
            stride = 8 * (2 ** li)
            ys = jnp.arange(hf, dtype=jnp.float32) * stride
            xs = jnp.arange(wf, dtype=jnp.float32) * stride
            valid = (
                (ys[None, :, None] < image_hw[:, 0, None, None])
                & (xs[None, None, :] < image_hw[:, 1, None, None])
            )                                           # [B, hf, wf]
            m = norms[li](m, valid)
            pos = jax.vmap(
                functools.partial(sine_position_embedding, d_model=d.d_model)
            )(valid).astype(self.dtype)
            pos = pos + self.level_embed[li].astype(self.dtype)
            tokens.append(m.reshape(b, hf * wf, d.d_model))
            poss.append(pos.reshape(b, hf * wf, d.d_model))
            valids.append(valid.reshape(b, hf * wf))
            # Valid fraction of the grid per axis, (w_ratio, h_ratio): the
            # image extent in stride units over the grid dim. FRACTIONAL by
            # design — an integer valid-token count would quantize the
            # scale and decouple it from the sampling grid whenever the
            # level doesn't exactly tile the canvas.
            vh = jnp.minimum(image_hw[:, 0] / (stride * hf), 1.0)
            vw = jnp.minimum(image_hw[:, 1] / (stride * wf), 1.0)
            ratios.append(jnp.stack([vw, vh], axis=-1))  # [B, 2]
        src = jnp.concatenate(tokens, axis=1)            # [B, N, d]
        pos = jnp.concatenate(poss, axis=1)
        valid_tokens = jnp.concatenate(valids, axis=1)   # [B, N]
        valid_ratios = jnp.stack(ratios, axis=1)         # [B, L, 2]
        return src, pos, valid_tokens, tuple(level_shapes), valid_ratios

    # ------------------------------------------------------------- forward
    def forward(self, images, image_hw, deterministic: bool = True):
        d = self.cfg.deformable_detr
        src, pos, valid_tokens, level_shapes, valid_ratios = (
            self._multi_scale(images, image_hw)
        )
        b = src.shape[0]

        # Encoder reference points: each token's own center, expressed in
        # valid-normalized coords, then scaled into every target level's
        # full grid by that level's valid ratio (official formulation —
        # this is what makes sampling canvas-padding-invariant).
        centers = level_reference_points(level_shapes)   # [N, 2] own-grid
        own_ratio = jnp.concatenate([
            jnp.broadcast_to(
                valid_ratios[:, li:li + 1, :], (b, hl * wl, 2)
            )
            for li, (hl, wl) in enumerate(level_shapes)
        ], axis=1)                                       # [B, N, 2]
        ref_valid = centers[None] / jnp.maximum(own_ratio, 1e-6)
        enc_ref = (
            ref_valid[:, :, None, :] * valid_ratios[:, None, :, :]
        )                                                # [B, N, L, 2]
        for layer in self.encoder:
            src = layer(
                src, pos, enc_ref, valid_tokens, level_shapes,
                deterministic,
            )

        # Decoder: learned queries + initial reference points.
        qe = self.query_embed.astype(jnp.float32)
        qpos = jnp.broadcast_to(
            qe[None, :, : d.d_model], (b, d.num_queries, d.d_model)
        ).astype(self.dtype)
        tgt = jnp.broadcast_to(
            qe[None, :, d.d_model:], (b, d.num_queries, d.d_model)
        ).astype(self.dtype)
        ref = jax.nn.sigmoid(
            self.ref_point_head(qpos.astype(jnp.float32))
        )                                                # [B, Q, 2] valid-nrm

        all_logits, all_boxes = [], []
        for i, layer in enumerate(self.decoder):
            if ref.shape[-1] == 2:
                ref_xy = ref[:, :, None, :] * valid_ratios[:, None, :, :]
                ref_wh = None
            else:
                scaled = (
                    ref[:, :, None, :]
                    * jnp.concatenate(
                        [valid_ratios, valid_ratios], axis=-1
                    )[:, None, :, :]
                )
                ref_xy, ref_wh = scaled[..., :2], scaled[..., 2:]
            tgt = layer(
                tgt, qpos, src, ref_xy, ref_wh, valid_tokens,
                level_shapes, deterministic,
            )
            hi = i if d.with_box_refine else 0
            logits = self.class_heads[hi](tgt.astype(jnp.float32))
            delta = self.bbox_heads[hi](tgt)
            if ref.shape[-1] == 2:
                anchor = jnp.concatenate(
                    [inverse_sigmoid(ref), jnp.zeros_like(ref)], axis=-1
                )
            else:
                anchor = inverse_sigmoid(ref)
            boxes = jax.nn.sigmoid(delta + anchor)
            all_logits.append(logits)
            all_boxes.append(boxes)
            if d.with_box_refine:
                ref = jax.lax.stop_gradient(boxes)
        return jnp.stack(all_logits), jnp.stack(all_boxes)

    def __call__(self, images, image_hw):  # parameter init only
        return self.forward(images, image_hw)


class DeformableDETR:
    """Pipeline orchestrator: the same ``init`` / ``loss`` / ``predict``
    surface as the other families."""

    def __init__(self, cfg: Config):
        if cfg.rpn_only or cfg.det_only:
            raise ValueError(
                "rpn_only/det_only are two-stage (Faster R-CNN) training "
                "modes; Deformable DETR has neither an RPN nor a second "
                "stage"
            )
        if cfg.backbone.use_fpn:
            raise ValueError(
                "model='deformable_detr' builds its own multi-scale "
                "projections from C3..C5 (paper §4.3); set "
                "backbone.use_fpn=False"
            )
        d = cfg.deformable_detr
        if d.num_levels < 3:
            raise ValueError(
                f"deformable_detr.num_levels must be >= 3 (C3..C5), got "
                f"{d.num_levels}"
            )
        if d.d_model % 4:
            raise ValueError(
                f"deformable_detr.d_model must be divisible by 4 (the 2-D "
                f"sine embedding splits it into y/x sin/cos quarters), got "
                f"{d.d_model}"
            )
        if d.d_model % d.num_heads:
            raise ValueError(
                f"deformable_detr.d_model {d.d_model} not divisible by "
                f"num_heads {d.num_heads}"
            )
        if d.num_queries < cfg.data.max_gt_boxes:
            raise ValueError(
                f"deformable_detr.num_queries ({d.num_queries}) must be >= "
                f"data.max_gt_boxes ({cfg.data.max_gt_boxes}): the "
                f"Hungarian matcher assigns every (padded) GT row a "
                f"distinct query"
            )
        self.cfg = cfg
        self.core = DeformableDETRCore(cfg)

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        h, w = self.cfg.data.canvas_height, self.cfg.data.canvas_width
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        hw = jnp.array([[float(h), float(w)]], jnp.float32)
        return self.core.init(rng, dummy, hw)

    # ---------------------------------------------------------------- loss
    def loss(
        self, variables, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        d = cfg.deformable_detr
        deterministic = d.dropout == 0.0
        kwargs = {} if deterministic else {"rngs": {"dropout": rng}}
        logits, boxes = self.core.apply(
            variables, batch["image"], batch["image_hw"],
            deterministic=deterministic,
            method=DeformableDETRCore.forward, **kwargs,
        )
        if not d.aux_loss:
            logits, boxes = logits[-1:], boxes[-1:]

        # GT -> normalized cxcywh in each image's TRUE extent (the frame
        # the reference points and predictions live in — same convention
        # as models/detr.py, same rationale).
        hw = batch["image_hw"].astype(jnp.float32)           # [B, 2] (h, w)
        norm = jnp.stack(
            [hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1
        )[:, None, :]
        gt_n = box_ops.xyxy_to_cxcywh(batch["gt_boxes"]) / norm

        per_image = functools.partial(
            L.deformable_detr_set_loss,
            cost_class=d.cost_class, cost_bbox=d.cost_bbox,
            cost_giou=d.cost_giou, alpha=d.focal_alpha, gamma=d.focal_gamma,
        )
        focal_s, l1_s, gi_s, npos = jax.vmap(
            jax.vmap(per_image, in_axes=(0, 0, 0, 0, 0)),
            in_axes=(0, 0, None, None, None),
        )(logits, boxes, gt_n, batch["gt_classes"], batch["gt_valid"])

        # Paper normalization: every term / total matched pairs per layer.
        total_pos = jnp.maximum(jnp.sum(npos[0]), 1.0)
        cls_loss = jnp.sum(focal_s, axis=1) / total_pos      # [Ldec]
        l1_loss = jnp.sum(l1_s, axis=1) / total_pos
        giou_loss = jnp.sum(gi_s, axis=1) / total_pos
        layer_losses = (
            d.loss_weight_class * cls_loss
            + d.loss_weight_bbox * l1_loss
            + d.loss_weight_giou * giou_loss
        )
        total = jnp.sum(layer_losses)
        return total, {
            "loss": total,
            "focal_cls_loss": cls_loss[-1],
            "l1_box_loss": l1_loss[-1],
            "giou_box_loss": giou_loss[-1],
            "num_gt": jnp.mean(npos[-1]),
        }

    # ----------------------------------------------------------- inference
    def _predict_single(self, logits, boxes_n, image_hw):
        """Per-image postprocess (paper eval protocol): top-k over the
        flattened (query, class) SIGMOID scores — no softmax, no no-object
        column — decode by the image's TRUE extent, clip. NO NMS."""
        d = self.cfg.deformable_detr
        num_classes = self.cfg.data.num_classes
        probs = jax.nn.sigmoid(logits)                   # [Q, C]
        flat = probs.reshape(-1)
        k = min(d.max_detections, flat.shape[0])
        scores, idx = jax.lax.top_k(flat, k)
        query = idx // num_classes
        classes = (idx % num_classes).astype(jnp.int32) + 1
        norm = jnp.stack(
            [image_hw[1], image_hw[0], image_hw[1], image_hw[0]]
        ).astype(jnp.float32)
        boxes = box_ops.cxcywh_to_xyxy(boxes_n[query]) * norm
        boxes = box_ops.clip_boxes(boxes, image_hw)
        valid = scores > d.score_thresh
        return (
            boxes,
            jnp.where(valid, scores, 0.0),
            jnp.where(valid, classes, 0),
            valid,
        )

    def predict(self, variables, batch: Dict[str, jnp.ndarray]):
        """Inference forward: the framework's detection dict contract."""
        logits, boxes_n = self.core.apply(
            variables, batch["image"], batch["image_hw"],
            deterministic=True, method=DeformableDETRCore.forward,
        )
        boxes, scores, classes, valid = jax.vmap(self._predict_single)(
            logits[-1], boxes_n[-1], batch["image_hw"]
        )
        return {
            "boxes": boxes,
            "scores": scores,
            "classes": classes,
            "valid": valid,
            "num_detections": jnp.sum(valid, axis=1).astype(jnp.int32),
        }
