"""DETR assembly (transformer set-prediction family — a build extra beyond
the TF2 reference's convolutional pipeline, reusing the framework's
backbone/data/eval components; Carion et al., arXiv:2005.12872).

This is the family that exercises the MXU's attention path: encoder
self-attention over the C5 token grid, decoder cross-attention from a fixed
set of learned object queries — all dense batched matmuls, no NMS, no
anchors, no RoI pooling anywhere. Its two classically-dynamic pieces are
made static-shape by construction:

- **Bipartite matching** runs INSIDE the jitted step via the exact
  Jonker–Volgenant solver in ``ops/hungarian.py`` (the canonical
  implementations host-callback scipy every step); padded GT rows carry
  constant cost, which provably cannot perturb the real matches.
- **Padding-aware attention**: the canvas's padded pixels are masked out as
  encoder/cross-attention KEYS, and the sine positional embedding is
  normalized over the VALID extent per image (the paper's mask-cumsum
  formulation) — so detection geometry is invariant to the static canvas
  the batch happened to land in.

Conventions match the other families: one Flax module owns backbone +
transformer + heads; the batch and detection dict contracts are identical,
so the trainer/evaluator/serving/CLIs stay model-agnostic via
``models.build_model``. Boxes regress as sigmoid (cx, cy, w, h) normalized
by each image's TRUE extent (canonical DETR: "relative to the image size"
— NOT the padded canvas, which the canvas-invariant inputs cannot
recover); inference is a plain top-k over (query, class) posteriors — the
set loss makes predictions non-overlapping by training, not by NMS.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudet.config import Config
from tpudet.models.resnet import build_backbone
from tpudet.ops import boxes as box_ops
from tpudet.train import losses as L


def sine_position_embedding(
    valid: jnp.ndarray, d_model: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """[H, W] validity mask -> [H, W, d_model] 2-D sine embedding (paper
    §3.2 / the reference implementation's mask-cumsum normalization): row
    and column positions are cumulative VALID counts scaled to [0, 2π] over
    the image's true extent, so the embedding is canvas-padding-invariant;
    half the channels encode y, half x, alternating sin/cos over a
    geometric frequency ladder."""
    m = valid.astype(jnp.float32)
    eps = 1e-6
    scale = 2.0 * math.pi
    y = jnp.cumsum(m, axis=0)
    x = jnp.cumsum(m, axis=1)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    half = d_model // 2
    dim_t = temperature ** (
        2.0 * (jnp.arange(half, dtype=jnp.float32) // 2) / half
    )
    py = y[..., None] / dim_t  # [H, W, half]
    px = x[..., None] / dim_t
    py = jnp.stack(
        [jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1
    ).reshape(*valid.shape, half)
    px = jnp.stack(
        [jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1
    ).reshape(*valid.shape, half)
    return jnp.concatenate([py, px], axis=-1)


class _FFN(nn.Module):
    d_model: int
    ffn_dim: int
    dropout: float
    dtype: Any

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(h)


class EncoderLayer(nn.Module):
    """Post-norm encoder layer; the spatial positional embedding is added
    to Q and K at EVERY layer (paper appendix A.3), never to V."""

    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float
    dtype: Any

    @nn.compact
    def __call__(self, src, pos, key_mask, deterministic: bool):
        q = src + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, dtype=self.dtype, name="self_attn",
        )(q, q, src, mask=key_mask, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(
            src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ffn = _FFN(self.d_model, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(src, deterministic)
        return nn.LayerNorm(name="norm2")(
            src + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        )


class DecoderLayer(nn.Module):
    """Post-norm decoder layer: query self-attention (query embedding added
    to Q/K), cross-attention into the encoder memory (query embedding on Q,
    spatial embedding on K, padded tokens masked), FFN."""

    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float
    dtype: Any

    @nn.compact
    def __call__(self, tgt, query_pos, memory, pos, key_mask,
                 deterministic: bool):
        q = tgt + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, dtype=self.dtype, name="self_attn",
        )(q, q, tgt, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, memory + pos, memory, mask=key_mask,
          deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ffn = _FFN(self.d_model, self.ffn_dim, self.dropout, self.dtype,
                   name="ffn")(tgt, deterministic)
        return nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        )


class DETRCore(nn.Module):
    """Backbone C5 -> 1x1 projection -> encoder -> decoder -> shared heads.

    Returns per-decoder-layer predictions ``[L, B, Q, C+1]`` logits and
    ``[L, B, Q, 4]`` sigmoid (cx, cy, w, h) normalized boxes — layer -1 is
    the model's output, the earlier layers feed the auxiliary losses."""

    cfg: Config

    def setup(self):
        bb = self.cfg.backbone
        d = self.cfg.detr
        dtype = jnp.bfloat16 if bb.dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        self.backbone = build_backbone(
            bb.name, bb.norm, dtype, bb.freeze_stem, s2d_stem=bb.s2d_stem,
            remat=bb.remat, stride_in_1x1=bb.stride_in_1x1,
        )
        self.input_proj = nn.Conv(
            d.d_model, (1, 1), dtype=dtype, name="input_proj"
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (d.num_queries, d.d_model), jnp.float32,
        )
        mk = functools.partial(
            dict, d_model=d.d_model, num_heads=d.num_heads,
            ffn_dim=d.ffn_dim, dropout=d.dropout, dtype=dtype,
        )
        self.encoder = [
            EncoderLayer(**mk(), name=f"enc{i}") for i in range(d.enc_layers)
        ]
        self.decoder = [
            DecoderLayer(**mk(), name=f"dec{i}") for i in range(d.dec_layers)
        ]
        self.dec_norm = nn.LayerNorm(name="dec_norm")
        self.class_head = nn.Dense(
            self.cfg.data.num_classes + 1, dtype=dtype, name="class_head"
        )
        self.bbox_head = [
            nn.Dense(d.d_model, dtype=dtype, name=f"bbox_fc{i}")
            for i in range(2)
        ] + [nn.Dense(4, dtype=dtype, name="bbox_out")]

    def forward(self, images, image_hw, deterministic: bool = True):
        d = self.cfg.detr
        feat = self.backbone(images)["c5"]        # [B, Hf, Wf, C]
        src = self.input_proj(feat)               # [B, Hf, Wf, d]
        b, hf, wf, _ = src.shape
        stride_y = -(-images.shape[1] // hf)      # ceil (SAME-padded convs)
        stride_x = -(-images.shape[2] // wf)

        # Token validity from each image's true extent on the canvas
        # (tokens whose receptive-field origin lies inside the image).
        ys = jnp.arange(hf, dtype=jnp.float32) * stride_y
        xs = jnp.arange(wf, dtype=jnp.float32) * stride_x
        valid = (
            (ys[None, :, None] < image_hw[:, 0, None, None])
            & (xs[None, None, :] < image_hw[:, 1, None, None])
        )                                          # [B, Hf, Wf]
        pos = jax.vmap(
            functools.partial(sine_position_embedding, d_model=d.d_model)
        )(valid).astype(self.dtype)                # [B, Hf, Wf, d]

        n = hf * wf
        src = src.reshape(b, n, d.d_model)
        pos = pos.reshape(b, n, d.d_model)
        key_mask = valid.reshape(b, 1, 1, n)       # broadcast [B, H, Q, K]

        for layer in self.encoder:
            src = layer(src, pos, key_mask, deterministic)

        tgt = jnp.zeros((b, d.num_queries, d.d_model), self.dtype)
        qpos = jnp.broadcast_to(
            self.query_embed.astype(self.dtype)[None],
            (b, d.num_queries, d.d_model),
        )
        states = []
        for layer in self.decoder:
            tgt = layer(tgt, qpos, src, pos, key_mask, deterministic)
            states.append(self.dec_norm(tgt))
        hs = jnp.stack(states)                     # [L, B, Q, d]

        logits = self.class_head(hs).astype(jnp.float32)
        x = hs
        for i, fc in enumerate(self.bbox_head):
            x = fc(x)
            if i < len(self.bbox_head) - 1:
                x = nn.relu(x)
        boxes = jax.nn.sigmoid(x.astype(jnp.float32))
        return logits, boxes

    def __call__(self, images, image_hw):  # parameter init only
        return self.forward(images, image_hw)


class DETR:
    """Pipeline orchestrator: the same ``init`` / ``loss`` / ``predict``
    surface as the other families."""

    def __init__(self, cfg: Config):
        if cfg.rpn_only or cfg.det_only:
            raise ValueError(
                "rpn_only/det_only are two-stage (Faster R-CNN) training "
                "modes; DETR has neither an RPN nor a second stage"
            )
        if cfg.backbone.use_fpn:
            raise ValueError(
                "model='detr' consumes the single-scale C5 feature "
                "(paper §3.3); set backbone.use_fpn=False"
            )
        d = cfg.detr
        if d.d_model % 4:
            raise ValueError(
                f"detr.d_model must be divisible by 4 (the 2-D sine "
                f"embedding splits it into y/x sin/cos quarters), got "
                f"{d.d_model}"
            )
        if d.d_model % d.num_heads:
            raise ValueError(
                f"detr.d_model {d.d_model} not divisible by num_heads "
                f"{d.num_heads}"
            )
        if d.num_queries < cfg.data.max_gt_boxes:
            raise ValueError(
                f"detr.num_queries ({d.num_queries}) must be >= "
                f"data.max_gt_boxes ({cfg.data.max_gt_boxes}): the "
                f"Hungarian matcher assigns every (padded) GT row a "
                f"distinct query"
            )
        self.cfg = cfg
        self.core = DETRCore(cfg)

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
        d = cfg.detr
        images = batch["image"]
        deterministic = d.dropout == 0.0
        kwargs = {} if deterministic else {"rngs": {"dropout": rng}}
        logits, boxes = self.core.apply(
            variables, images, batch["image_hw"],
            deterministic=deterministic, method=DETRCore.forward, **kwargs,
        )
        if not d.aux_loss:
            logits, boxes = logits[-1:], boxes[-1:]

        # GT -> normalized cxcywh in each image's TRUE extent (canonical
        # DETR: boxes are relative to the image size). Normalizing by the
        # padded canvas would make the target scale depend on the aspect
        # bucket's fill ratio — the inputs are deliberately canvas-invariant
        # (masked attention keys + valid-extent sine embedding), so the
        # network could only recover the canvas by memorizing the bucket
        # table, and a checkpoint would silently rescale if the buckets
        # differed between train and eval/export.
        hw = batch["image_hw"].astype(jnp.float32)           # [B, 2] (h, w)
        norm = jnp.stack(
            [hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1
        )[:, None, :]                                         # [B, 1, 4]
        gt_n = box_ops.xyxy_to_cxcywh(batch["gt_boxes"]) / norm

        per_image = functools.partial(
            L.detr_set_loss,
            cost_class=d.cost_class, cost_bbox=d.cost_bbox,
            cost_giou=d.cost_giou, eos_coef=d.eos_coef,
        )
        # vmap over batch, then over decoder layers (same matching code per
        # layer — the paper matches each auxiliary head independently).
        ce_s, ce_w, l1_s, gi_s, npos = jax.vmap(
            jax.vmap(per_image, in_axes=(0, 0, 0, 0, 0)),
            in_axes=(0, 0, None, None, None),
        )(logits, boxes, gt_n, batch["gt_classes"], batch["gt_valid"])

        # Paper normalization per layer: CE = weighted mean over every
        # query in the batch; box terms / total matched pairs in the batch.
        total_pos = jnp.maximum(jnp.sum(npos[0]), 1.0)
        cls_loss = jnp.sum(ce_s, axis=1) / jnp.sum(ce_w, axis=1)   # [L]
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
            # The reported components are the FINAL layer's (the model
            # output); aux layers contribute to "loss" only.
            "class_ce_loss": cls_loss[-1],
            "l1_box_loss": l1_loss[-1],
            "giou_box_loss": giou_loss[-1],
            # Mean valid-GT count per image (the matcher assigns every
            # valid GT a query, so this is a batch property, not a
            # matching-quality signal — named accordingly).
            "num_gt": jnp.mean(npos[-1]),
        }

    # ----------------------------------------------------------- inference
    def _predict_single(self, logits, boxes_n, image_hw):
        """Per-image postprocess (paper §4 eval protocol): top-k over the
        (query, class) posterior — softmax includes no-object, foreground
        columns only — decode by the image's TRUE extent (the frame the
        boxes are normalized in), clip. NO NMS: the set loss trains queries
        to not duplicate."""
        d = self.cfg.detr
        num_classes = self.cfg.data.num_classes
        probs = jax.nn.softmax(logits, axis=-1)[:, 1:]   # [Q, C]
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
        """Inference forward: the framework's detection dict contract
        (boxes [B, D, 4] canvas coords, scores, classes 1..C, valid,
        num_detections), same as the other families."""
        images = batch["image"]
        logits, boxes_n = self.core.apply(
            variables, images, batch["image_hw"],
            deterministic=True, method=DETRCore.forward,
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
