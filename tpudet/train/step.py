"""Jit-compiled training step, data-parallel over the mesh (SURVEY.md C18;
reference call stack 3a — but as ONE traced XLA program per step, with the
state donated so parameter buffers are updated in place).

Sharding layout: batch leaves sharded on 'data' (leading axis), train state
replicated. XLA inserts the gradient all-reduce (psum over 'data') during
SPMD partitioning — there is no hand-written collective here (scaling-book
recipe; the communication backend row of SURVEY.md §2)."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpudet.config import Config
from tpudet.train.state import TrainState, make_optimizer


def make_train_step(
    model, cfg: Config, mesh: Optional[Mesh] = None,
    fused_preprocess: bool = False, state_example: Optional[TrainState] = None,
) -> Callable[[TrainState, dict], Tuple[TrainState, dict]]:
    """Returns jitted ``(state, batch) -> (state, metrics)``.

    With ``fused_preprocess`` the device half of the input pipeline
    (uint8→float normalize + random flip) runs inside the same XLA program as
    the model — the batch arrives as raw uint8 canvases (4x cheaper
    host→device) and never round-trips."""
    if cfg.det_only and "rpn_head" not in cfg.train.freeze:
        # det_only gives the RPN zero loss gradient, so an unfrozen RPN
        # would only be eroded by weight decay — require the freeze so the
        # proposal distribution the detector trains against stays fixed.
        raise ValueError(
            "det_only training requires 'rpn_head' in train.freeze "
            "(the RPN supplies proposals but receives no gradient)"
        )
    tx = make_optimizer(cfg.train)
    accum = max(1, cfg.train.accum_steps)
    if accum > 1:
        if cfg.train.batch_size % accum:
            raise ValueError(
                f"train.batch_size {cfg.train.batch_size} not divisible by "
                f"train.accum_steps {accum}"
            )
        if mesh is not None and (
            cfg.train.batch_size // accum
        ) % mesh.shape["data"]:
            raise ValueError(
                f"microbatch {cfg.train.batch_size // accum} (batch_size/"
                f"accum_steps) not divisible by the data-mesh size "
                f"{mesh.shape['data']}"
            )

    def _microbatch_grads(state, batch, micro_rng):
        """Forward/backward on one microbatch → (grads, metrics)."""
        if fused_preprocess:
            from tpudet.data.preprocess import device_preprocess

            micro_rng, aug_rng = jax.random.split(micro_rng)
            batch = device_preprocess(cfg, batch, aug_rng, training=True)

        def loss_fn(params):
            variables = {"params": params, **state.constants}
            loss, metrics = model.loss(variables, batch, micro_rng)
            return loss, metrics

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params)
        if cfg.train.freeze:
            # Zero frozen grads HERE, not only inside the optimizer chain:
            # every later consumer (grad_norm metric, accum sum, tx.update)
            # then sees zeros, so the frozen backward cone really is dead
            # code XLA eliminates — a single raw-grad use (e.g. the
            # grad_norm metric) would otherwise keep the whole frozen
            # backward pass live and report a norm the clipper never sees.
            from tpudet.train.state import freeze_mask

            mask = freeze_mask(state.params, cfg.train.freeze)
            grads = jax.tree.map(
                lambda g, m: jax.numpy.zeros_like(g) if m else g, grads, mask
            )
        return grads, metrics

    def step_fn(state: TrainState, batch):
        # Per-step rng: deterministic in (seed, step), independent across steps.
        step_rng = jax.random.fold_in(state.rng, state.step)
        if accum == 1:
            grads, metrics = _microbatch_grads(state, batch, step_rng)
        else:
            # Reshape [B, ...] -> [B/accum, accum, ...]: the sharded batch
            # axis stays axis 0, so each device's shard remains its own
            # contiguous rows and the reshape inserts no collective; each
            # microbatch is a strided slice of the (i.i.d.) global batch.
            micro = jax.tree.map(
                lambda x: x.reshape(
                    x.shape[0] // accum, accum, *x.shape[1:]
                ),
                batch,
            )

            def body(gsum, a):
                mb = jax.tree.map(lambda x: x[:, a], micro)
                g, m = _microbatch_grads(
                    state, mb, jax.random.fold_in(step_rng, a)
                )
                # Sum into the carry (one grad-sized buffer, not accum of
                # them); scalar metrics stack and average below.
                return jax.tree.map(jax.numpy.add, gsum, g), m

            gsum, mstack = jax.lax.scan(
                body,
                jax.tree.map(jax.numpy.zeros_like, state.params),
                jax.numpy.arange(accum),
            )
            # Microbatch losses are per-microbatch means over equal-sized
            # slices, so the plain average reproduces the full-batch mean.
            grads = jax.tree.map(lambda g: g / accum, gsum)
            metrics = jax.tree.map(lambda m: m.mean(axis=0), mstack)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        if cfg.train.ema_decay > 0:
            if state.ema_params is None:
                raise ValueError(
                    "train.ema_decay > 0 but state.ema_params is None — the "
                    "state predates EMA (e.g. --init-from without EMA); "
                    "recreate it via create_train_state with this config"
                )
            from tpudet.train.state import ema_decay_at

            d = ema_decay_at(cfg.train, new_state.step)
            new_state = new_state.replace(
                ema_params=jax.tree.map(
                    # e + (1-d)(p-e), computed in the param dtype: one fused
                    # elementwise pass, no f64 promotion.
                    lambda e, p: e + (1.0 - d).astype(p.dtype) * (p - e),
                    state.ema_params,
                    params,
                )
            )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    from tpudet.parallel.sharding_rules import train_state_shardings

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if state_example is not None:
        state_sharding = train_state_shardings(mesh, state_example)
    else:
        state_sharding = repl
    return jax.jit(
        step_fn,
        in_shardings=(state_sharding, data),
        out_shardings=(state_sharding, repl),
        donate_argnums=0,
    )


def make_eval_step(
    model, cfg: Config, mesh: Optional[Mesh] = None, fused_preprocess: bool = False
):
    """Jitted batched inference step (3b): ``(variables, batch) -> detections``."""

    def eval_fn(variables, batch):
        if fused_preprocess:
            from tpudet.data.preprocess import device_preprocess

            batch = device_preprocess(cfg, batch, training=False)
        return model.predict(variables, batch)

    if mesh is None:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(eval_fn, in_shardings=(repl, data), out_shardings=data)
