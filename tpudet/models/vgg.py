"""VGG-16 backbone — the original Faster R-CNN backbone (arXiv:1506.01497
§3.2 trains VGG-16; SURVEY.md C5 `[RECALL-MED]`: the TF2 reference's
keras.applications backbone is ResNet50 *or VGG16*, so both are provided).

TPU notes: VGG is all 3x3 SAME convs — XLA maps them straight onto the MXU
with no shortcut/norm plumbing; there are NO norm layers (keras VGG16 has
none), convs carry biases. Feature contract matches the ResNet pyramid:

    c2 = conv3_3 (stride 4), c3 = conv4_3 (stride 8),
    c4 = conv5_3 (stride 16) — the paper's RPN/RoI feature (pool5 dropped),
    c5 = pool5(conv5_3) (stride 32) — only so FPN's lateral set is complete.

``freeze_stem`` stops gradients after conv2_2: Fast R-CNN §4.5 found
fine-tuning conv3_1-and-up optimal for VGG-16 and froze conv1/conv2."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

# (num 3x3 convs, channels) per stage; pooling precedes stages 2-5.
VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class _VGGStage(nn.Module):
    n_convs: int
    channels: int
    stage: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            x = nn.Conv(
                self.channels, (3, 3), dtype=self.dtype,
                name=f"conv{self.stage}_{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class VGG(nn.Module):
    """VGG-16 to the c2..c5 pyramid contract (see module docstring)."""

    dtype: Any = jnp.float32
    freeze_stem: bool = True
    # Rematerialize each conv stage on the backward pass (same HBM-for-FLOPs
    # trade as ResNet.remat; VGG's wide early stages make this matter more).
    remat: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        feats = {}
        stage_cls = nn.remat(_VGGStage) if self.remat else _VGGStage
        for stage, (n, ch) in enumerate(VGG16_STAGES, start=1):
            if stage > 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = stage_cls(n, ch, stage, self.dtype, name=f"stage{stage}")(x)
            if stage == 2 and self.freeze_stem:
                x = jax.lax.stop_gradient(x)
            if stage >= 3:
                # conv3_3 @ s4, conv4_3 @ s8, conv5_3 @ s16.
                feats[f"c{stage - 1}"] = x
        feats["c5"] = nn.max_pool(x, (2, 2), strides=(2, 2))  # s32 (FPN only)
        return feats
