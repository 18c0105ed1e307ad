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
    # Exponential moving average of params (train.ema_decay > 0), else None.
    # None is an empty pytree, so disabled-EMA states keep the exact
    # checkpoint/sharding tree shape they had before the field existed.
    ema_params: Any = None

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.constants:
            v.update(self.constants)
        return v

    def eval_variables(self, use_ema: bool = False) -> Dict[str, Any]:
        """Variables for inference — the EMA average when requested (the
        serving-quality weights; eval/detect/export CLIs' --ema)."""
        if not use_ema:
            return self.variables
        if self.ema_params is None:
            raise ValueError(
                "--ema requested but this state carries no EMA average "
                "(it was trained with train.ema_decay=0)"
            )
        v = {"params": self.ema_params}
        if self.constants:
            v.update(self.constants)
        return v


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear warmup, then the configured decay: "step" (piecewise-constant
    drops at lr_milestones — the reference's schedule) or "cosine"
    (half-cosine from learning_rate down to lr_min_factor * learning_rate
    at total_steps, the detection-community alternative)."""
    kind = getattr(cfg, "lr_schedule", "step")
    if kind == "step":
        boundaries = {int(s): cfg.lr_gamma for s in cfg.lr_milestones}
        base = optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)
    elif kind == "cosine":
        lr_min = cfg.lr_min_factor * cfg.learning_rate

        def base(step):
            frac = jnp.minimum(step, cfg.total_steps) / max(cfg.total_steps, 1)
            return lr_min + 0.5 * (cfg.learning_rate - lr_min) * (
                1.0 + jnp.cos(jnp.pi * frac)
            )
    else:
        raise ValueError(
            f"unknown train.lr_schedule {kind!r} (use 'step' or 'cosine')"
        )

    def schedule(step):
        lr = base(step)
        warm = cfg.warmup_factor + (1.0 - cfg.warmup_factor) * (
            jnp.minimum(step, cfg.warmup_steps) / max(cfg.warmup_steps, 1)
        )
        return lr * jnp.where(step < cfg.warmup_steps, warm, 1.0)

    return schedule


def ema_decay_at(cfg: TrainConfig, num_updates):
    """Effective EMA decay after ``num_updates`` optimizer updates: ramps in
    as min(ema_decay, (1 + n) / (10 + n)) (the TF OD API convention) so the
    first steps do not pin the average to the random init."""
    n = jnp.asarray(num_updates, jnp.float32)
    return jnp.minimum(cfg.ema_decay, (1.0 + n) / (10.0 + n))


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
    if cfg.weight_decay > 0 and cfg.optimizer != "adamw":
        # Coupled L2: the decay term is added to the GRADIENT before the
        # optimizer core (for Adam that means it flows through the moment
        # estimates). "adamw" below decays decoupled instead.
        parts.append(
            optax.masked(optax.add_decayed_weights(cfg.weight_decay), decay_mask)
        )
    if cfg.optimizer == "sgd":
        parts += [optax.sgd(schedule, momentum=cfg.momentum)]
    elif cfg.optimizer == "adam":
        parts += [optax.adam(schedule)]
    elif cfg.optimizer == "adamw":
        # Decoupled weight decay (Loshchilov & Hutter, arXiv:1711.05101):
        # the decay is applied to the UPDATE after the Adam moments — NOT
        # fed through the adaptive denominator like add_decayed_weights +
        # adam would. This is torch.optim.AdamW's semantics, which the DETR
        # recipe (arXiv:2005.12872 §4) trains with. Same ndim>=2 decay mask
        # as the coupled path (biases/norms exempt).
        parts += [
            optax.adamw(
                schedule, weight_decay=cfg.weight_decay, mask=decay_mask
            )
        ]
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.backbone_lr_factor != 1.0:
        # Per-group LR (DETR-style backbone fine-tuning): scale the
        # backbone subtree's UPDATES after the optimizer core, so the
        # factor multiplies the effective step (decay included) exactly
        # like a torch param-group lr.
        backbone = lambda params: freeze_mask(params, ("backbone",))
        parts.append(
            optax.masked(optax.scale(cfg.backbone_lr_factor), backbone)
        )
    if frozen is not None:
        # ... and zero frozen UPDATES last, so weight decay (which adds
        # wd * p regardless of the gradient) cannot move a frozen param:
        # frozen leaves are bit-identical across steps.
        parts.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*parts)


def create_train_state(model, cfg: TrainConfig, rng: jax.Array) -> TrainState:
    """Initialize parameters and optimizer state for a FasterRCNN model."""
    if not 0.0 <= cfg.ema_decay < 1.0:
        raise ValueError(
            f"train.ema_decay {cfg.ema_decay} must be in [0, 1) (0 disables)"
        )
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
        # A REAL copy, not an alias: the jitted step donates the whole
        # TrainState, and two pytree leaves sharing one buffer would be
        # "donated twice" (XLA INVALID_ARGUMENT).
        ema_params=(
            jax.tree.map(jnp.copy, params) if cfg.ema_decay > 0 else None
        ),
    )
