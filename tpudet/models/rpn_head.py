"""RPN head (SURVEY.md C9; Faster R-CNN §3.1): 3x3 conv (shared), then 1x1
objectness logits (A per cell, sigmoid parameterization — equivalent to the
paper's 2-way softmax) and 1x1 box deltas (4A per cell).

Outputs are flattened to [B, H*W*A] / [B, H*W*A, 4] in the exact (y, x, a)
row-major order produced by ``tpudet.ops.anchors.generate_anchors`` so score
i aligns with anchor i. With FPN the head is shared across levels (weights
reused; callers concatenate per-level flattened outputs in level order,
matching ``generate_fpn_anchors``)."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    num_anchors: int  # anchors per cell (A)
    conv_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, H, W, C] -> (logits [B, H*W*A], deltas [B, H*W*A, 4])."""
        x = nn.Conv(
            self.conv_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="conv",
        )(feat)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype, name="objectness",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        deltas = nn.Conv(
            4 * self.num_anchors, (1, 1), dtype=self.dtype, name="deltas",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        b = feat.shape[0]
        logits = logits.reshape(b, -1).astype(jnp.float32)
        deltas = deltas.reshape(b, -1, 4).astype(jnp.float32)
        return logits, deltas
