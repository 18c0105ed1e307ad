"""Train state + optimizer/schedule construction (SURVEY.md C17).

Reference knobs (Faster R-CNN practice): SGD momentum 0.9, weight decay 5e-4,
step LR drops; warmup added (standard for detection training stability).
Weight decay masks out biases and normalization parameters (ndim < 2).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpudet.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    constants: Any  # frozen collections (e.g. frozen-BN stats), no grads
    opt_state: Any
    rng: jax.Array

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.constants:
            v.update(self.constants)
        return v


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear warmup then piecewise-constant step decay."""
    boundaries = {int(s): cfg.lr_gamma for s in cfg.lr_milestones}
    base = optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)

    def schedule(step):
        lr = base(step)
        warm = cfg.warmup_factor + (1.0 - cfg.warmup_factor) * (
            jnp.minimum(step, cfg.warmup_steps) / max(cfg.warmup_steps, 1)
        )
        return lr * jnp.where(step < cfg.warmup_steps, warm, 1.0)

    return schedule


def freeze_mask(params, prefixes):
    """Bool pytree matching ``params``: True where the leaf's slash-joined
    path starts with one of ``prefixes`` (cfg.train.freeze — the paper's
    alternating-training stage freezes). Raises on a prefix that matches no
    leaf, so a typo fails at optimizer init instead of silently training
    everything."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)

    def frozen(path):
        joined = "/".join(str(p) for p in path)
        return any(
            joined == p or joined.startswith(p + "/") for p in prefixes
        )

    mask = {k: frozen(k) for k in flat}
    for p in prefixes:
        if not any(
            "/".join(str(s) for s in k) == p
            or "/".join(str(s) for s in k).startswith(p + "/")
            for k in flat
        ):
            raise ValueError(
                f"train.freeze prefix {p!r} matches no parameter; top-level "
                f"subtrees: {sorted({k[0] for k in flat})}"
            )
    return traverse_util.unflatten_dict(mask)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = lr_schedule(cfg)
    decay_mask = lambda params: jax.tree_util.tree_map(
        lambda p: p.ndim >= 2, params
    )
    parts = []
    frozen = None
    if cfg.freeze:
        frozen = lambda params: freeze_mask(params, cfg.freeze)
        # Zero frozen grads FIRST: global-norm clipping then measures only
        # the trainable leaves, momentum/Adam moments stay exactly zero, and
        # the frozen backward cone becomes dead code XLA eliminates.
        parts.append(optax.masked(optax.set_to_zero(), frozen))
    if cfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        parts.append(
            optax.masked(optax.add_decayed_weights(cfg.weight_decay), decay_mask)
        )
    if cfg.optimizer == "sgd":
        parts += [optax.sgd(schedule, momentum=cfg.momentum)]
    elif cfg.optimizer == "adam":
        parts += [optax.adam(schedule)]
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if frozen is not None:
        # ... and zero frozen UPDATES last, so weight decay (which adds
        # wd * p regardless of the gradient) cannot move a frozen param:
        # frozen leaves are bit-identical across steps.
        parts.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*parts)


def create_train_state(model, cfg: TrainConfig, rng: jax.Array) -> TrainState:
    """Initialize parameters and optimizer state for a FasterRCNN model."""
    rng_init, rng_state = jax.random.split(rng)
    variables = model.init(rng_init)
    params = variables["params"]
    constants = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=constants,
        opt_state=tx.init(params),
        rng=rng_state,
    )
