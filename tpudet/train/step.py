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
    tx = make_optimizer(cfg.train)

    def step_fn(state: TrainState, batch):
        # Per-step rng: deterministic in (seed, step), independent across steps.
        step_rng = jax.random.fold_in(state.rng, state.step)
        if fused_preprocess:
            from tpudet.data.preprocess import device_preprocess

            step_rng, aug_rng = jax.random.split(step_rng)
            batch = device_preprocess(cfg, batch, aug_rng, training=True)

        def loss_fn(params):
            variables = {"params": params, **state.constants}
            loss, metrics = model.loss(variables, batch, step_rng)
            return loss, metrics

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
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
