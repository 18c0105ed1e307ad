"""Panoptic FPN semantic head (Kirillov et al., arXiv:1901.02446 §3 — a
build extra beyond the box-only TF2 reference): each FPN level p2..p5 passes
through (1, 1, 2, 3) stages of 3x3 conv + GroupNorm + ReLU, the coarser
levels bilinearly 2x-upsampled per stage, all summed at 1/4 scale, then a
1x1 conv to the semantic class logits.

TPU notes: the tower is plain dense conv work; the 2x upsamples are fixed
``jax.image.resize`` calls XLA lowers to small convolutions, and the final
sum fuses into the last stage's epilogue. Channel count (128 default) keeps
the head ~5% of backbone FLOPs, per the paper."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class SemanticHead(nn.Module):
    num_classes: int  # stuff + thing classes (label l > 0 -> channel l - 1)
    channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """{p2..p5} -> semantic logits [B, H/4, W/4, num_classes] (f32)."""
        total = None
        target_hw = feats["p2"].shape[1:3]
        for name, n_up in (("p2", 0), ("p3", 1), ("p4", 2), ("p5", 3)):
            x = feats[name].astype(self.dtype)
            for j in range(max(n_up, 1)):
                x = nn.Conv(
                    self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"{name}_conv{j}",
                )(x)
                x = nn.GroupNorm(
                    num_groups=min(32, self.channels), dtype=self.dtype,
                    name=f"{name}_gn{j}",
                )(x)
                x = nn.relu(x)
                if j < n_up:
                    b, h, w, c = x.shape
                    x = jax.image.resize(
                        x, (b, 2 * h, 2 * w, c), "bilinear"
                    ).astype(self.dtype)
            # Ceil-grid strides can leave a 1-px mismatch vs p2's shape.
            x = x[:, : target_hw[0], : target_hw[1], :]
            total = x if total is None else total + x
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="predict",
        )(total)
        return logits.astype(jnp.float32)
