"""Keypoint R-CNN head (He et al., arXiv:1703.06870 §5 — a build extra
beyond the box-only TF2 reference): a per-RoI FCN predicting one heatmap per
keypoint; a visible keypoint trains as a one-hot softmax over the heatmap
grid, which the paper found crucial vs per-pixel regression.

Architecture (paper §5 / Detectron's keypoint_rcnn heads): ``num_convs``
3x3 convs at ``channels`` + ReLU, a 2x2 stride-2 transposed conv, then a 2x
bilinear upsample — the pooled s x s features become 4s x 4s heatmap logits
(14 -> 56 canonically). The final conv predicts the K keypoint channels
BEFORE the bilinear upsample (Detectron order), so the upsample is a cheap
K-channel resize instead of a ``channels``-wide one.

TPU notes: like the mask head, this is dense conv work batching over
N = B * rois_per_image; the bilinear 2x upsample is a fixed
jax.image.resize XLA lowers to two tiny convolutions."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class KeypointHead(nn.Module):
    num_keypoints: int
    num_convs: int = 8
    channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: jnp.ndarray) -> jnp.ndarray:
        """[N, s, s, C_feat] -> keypoint heatmap logits [N, 4s, 4s, K]."""
        x = rois.astype(self.dtype)
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_convs):
            x = nn.Conv(
                self.channels, (3, 3), dtype=self.dtype, kernel_init=init,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        logits = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), dtype=self.dtype,
            kernel_init=init, name="deconv",
        )(x)
        n, h, w, k = logits.shape
        logits = jax.image.resize(
            logits.astype(jnp.float32), (n, 2 * h, 2 * w, k), "bilinear"
        )
        return logits
