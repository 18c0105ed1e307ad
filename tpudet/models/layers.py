"""Shared building blocks: normalization layers and conv helper.

TPU-first normalization choices (SURVEY.md C5 note):
  * ``FrozenBatchNorm`` — inference-mode BN folded to a per-channel affine
    ``x * w + b`` (w = γ/√(σ²+ε), b = β − μ·w). Stats and affine live in the
    ``constants`` collection: no gradients, no mutable state, nothing to sync
    across the data-parallel mesh. This is how pretrained ResNet stats are
    consumed (standard detection fine-tuning, Faster R-CNN §3.2).
  * GroupNorm — for training from scratch: stateless, batch-independent, so
    per-device statistics never diverge across data-parallel shards (plain BN
    would need cross-replica sync; the reference never faces this because it
    is single-device).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine, as constants."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.variable("constants", "scale", nn.initializers.ones, None, (c,))
        bias = self.variable("constants", "bias", nn.initializers.zeros, None, (c,))
        mean = self.variable("constants", "mean", nn.initializers.zeros, None, (c,))
        var = self.variable("constants", "var", nn.initializers.ones, None, (c,))
        w = scale.value / jnp.sqrt(var.value + self.epsilon)
        b = bias.value - mean.value * w
        return x * w.astype(self.dtype) + b.astype(self.dtype)


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm with num_groups = gcd(32, C) so any channel count works."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        groups = math.gcd(32, x.shape[-1])
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)


def make_norm(kind: str, dtype: Any) -> Callable[..., nn.Module]:
    """Returns a factory ``f(name=None) -> norm module``."""
    if kind == "frozen_bn":
        return lambda name=None: FrozenBatchNorm(dtype=dtype, name=name)
    if kind == "gn":
        return lambda name=None: AdaptiveGroupNorm(dtype=dtype, name=name)
    if kind == "none":
        return lambda name=None: (lambda x: x)
    raise ValueError(f"unknown norm: {kind!r} (use 'frozen_bn', 'gn', 'none')")
