"""Fast R-CNN detection head (SURVEY.md C13; Fast R-CNN §2.1): flattened RoI
features -> two FC layers -> (C+1)-way class logits + per-class box deltas.

Class convention: index 0 = background, 1..C = foreground classes. The box
branch predicts 4C deltas (one set per foreground class) unless
``class_agnostic`` — then a single set of 4. These are big MXU-friendly
matmuls: [B*R, S*S*C_feat] x [., fc_dim]."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FastRCNNHead(nn.Module):
    num_classes: int  # foreground classes (C)
    fc_dim: int = 1024
    class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[N, S, S, C_feat] -> (cls_logits [N, C+1], deltas [N, C_box, 4])."""
        n = rois.shape[0]
        x = rois.reshape(n, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        cls_logits = nn.Dense(
            self.num_classes + 1, dtype=self.dtype, name="cls",
            kernel_init=nn.initializers.normal(0.01),
        )(x)
        num_box_classes = 1 if self.class_agnostic else self.num_classes
        deltas = nn.Dense(
            4 * num_box_classes, dtype=self.dtype, name="bbox",
            kernel_init=nn.initializers.normal(0.001),
        )(x)
        return (
            cls_logits.astype(jnp.float32),
            deltas.reshape(n, num_box_classes, 4).astype(jnp.float32),
        )
