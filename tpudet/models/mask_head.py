"""Mask R-CNN mask head (He et al., arXiv:1703.06870 §3; a build extra
beyond the box-only TF2 reference — SURVEY.md lists the reference's heads as
RPN + Fast R-CNN only): a small FCN over per-RoI features predicting one
m x m sigmoid mask per class.

Architecture (paper Fig. 4 right / Detectron's mask_rcnn_fcn_head_v1upXconvs):
``num_convs`` 3x3 convs at ``channels`` + ReLU, a 2x2 stride-2 transposed
conv + ReLU doubling the spatial size, and a 1x1 conv to the per-class mask
logits. MSRA (He) init on all convs per the paper's training setup.

TPU notes: everything here is dense conv work that XLA tiles straight onto
the MXU — the [N, 14, 14, 256] activations batch over N = B * rois_per_image,
which is large (512-2k), so the convs run at full MXU utilization despite the
small spatial extent. Logits are returned in f32 (loss-side numerics) while
the tower computes in the configured dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MaskHead(nn.Module):
    num_classes: int  # foreground classes (C); 1 if class-agnostic
    num_convs: int = 4
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: jnp.ndarray) -> jnp.ndarray:
        """[N, s, s, C_feat] -> mask logits [N, 2s, 2s, num_classes]."""
        x = rois.astype(self.dtype)
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_convs):
            x = nn.Conv(
                self.channels, (3, 3), dtype=self.dtype, kernel_init=init,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.channels, (2, 2), strides=(2, 2), dtype=self.dtype,
            kernel_init=init, name="deconv",
        )(x)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), name="predict",
        )(x)
        return logits.astype(jnp.float32)
