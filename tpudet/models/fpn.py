"""Feature Pyramid Network (SURVEY.md C24 — build-only: the reference is
single-scale, but the driver's config 5 requires ResNet-101 + FPN).

Standard FPN (Lin et al.): 1x1 lateral projections of c2–c5, top-down
nearest-neighbor upsampling with addition, 3x3 output convs -> p2–p5, plus p6
by stride-2 max-pool of p5. All levels share ``channels`` (default 256)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp


class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["c2", "c3", "c4", "c5"]
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype, name=f"lateral_{n}")(
                feats[n]
            )
            for n in names
        ]
        # Top-down pathway: upsample by 2 (nearest) and add.
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in range(2, -1, -1):
            up = merged[i + 1]
            b, h, w, c = up.shape
            th, tw = laterals[i].shape[1], laterals[i].shape[2]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)[:, :th, :tw, :]
            merged[i] = laterals[i] + up
        outs = {
            f"p{i + 2}": nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"output_p{i + 2}",
            )(m)
            for i, m in enumerate(merged)
        }
        outs["p6"] = nn.max_pool(
            outs["p5"], (1, 1), strides=(2, 2), padding="VALID"
        )
        return outs


class RetinaNetFPN(nn.Module):
    """RetinaNet's pyramid variant (arXiv:1708.02002 §4 footnote 2): P3–P5
    from c3–c5 laterals + top-down (no P2 — its 1/4-resolution grid costs 4x
    the head compute for objects the sub-octave anchors already cover), P6 a
    stride-2 3x3 CONV on c5 (not the FPN paper's max-pool), P7 ReLU + a
    stride-2 3x3 conv on P6, extending coverage to ~800-px objects."""

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = ["c3", "c4", "c5"]
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype, name=f"lateral_{n}")(
                feats[n]
            )
            for n in names
        ]
        merged = [None] * 3
        merged[2] = laterals[2]
        for i in range(1, -1, -1):
            up = merged[i + 1]
            th, tw = laterals[i].shape[1], laterals[i].shape[2]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)[:, :th, :tw, :]
            merged[i] = laterals[i] + up
        outs = {
            f"p{i + 3}": nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"output_p{i + 3}",
            )(m)
            for i, m in enumerate(merged)
        }
        outs["p6"] = nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="p6_conv",
        )(feats["c5"])
        outs["p7"] = nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="p7_conv",
        )(nn.relu(outs["p6"]))
        return outs
