"""Checkpointing via orbax (SURVEY.md C19 — the reference's
``tf.train.CheckpointManager`` semantics: save every N steps, keep last k,
restore-on-start; async so the save overlaps the next steps)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from tpudet.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(jax.device_get(state.step))
        if step == self._mgr.latest_step():
            # Already saved (e.g. the end-of-training force-save landing on
            # a step the every-N save just wrote — orbax raises
            # StepAlreadyExistsError even under force).
            return False
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def _ckpt_has_ema(self, step) -> Optional[bool]:
        """Whether the checkpoint carries an EMA average; None = can't tell
        (metadata unavailable — fall back to the strict template match)."""
        try:
            meta = self._mgr.item_metadata(step)
            if "ema_params" not in meta.keys():
                return False  # pre-EMA checkpoint
            return meta["ema_params"] is not None
        except Exception:  # noqa: BLE001 — orbax metadata API drift
            return None

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state`` (shapes/shardings).

        The EMA subtree is reconciled against the checkpoint rather than
        strictly matched — orbax StandardRestore raises an opaque
        tree-structure error on ANY mismatch, which would make every
        cross-config workflow crash (evaluating an EMA-trained checkpoint
        without re-passing the train-time --set, enabling EMA mid-training,
        --ema against the wrong artifact):
          * checkpoint HAS an average, template doesn't -> the slot is added
            and the real average restored (so eval --ema works without
            replicating train-time overrides);
          * checkpoint LACKS one, template expects it (EMA newly enabled) ->
            restore without the slot, then restart the average from the
            restored params (the same semantics as a warm start).
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return state
        ckpt_has = self._ckpt_has_ema(step)
        if ckpt_has is True and state.ema_params is None:
            state = state.replace(
                ema_params=jax.tree.map(jax.numpy.copy, state.params)
            )
        strip = ckpt_has is False and state.ema_params is not None
        template = state.replace(ema_params=None) if strip else state
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        if strip:
            restored = restored.replace(
                ema_params=jax.tree.map(jax.numpy.copy, restored.params)
            )
        return restored

    def restore_eval(
        self, state: TrainState, step: Optional[int] = None
    ) -> TrainState:
        """Eval-path restore: params + constants (+ the EMA average and the
        step counter when present), IGNORING opt_state. Evaluating/exporting
        a checkpoint must not require replicating the train-time optimizer
        config — a checkpoint trained with ``--set train.optimizer=adamw``
        would otherwise fail StandardRestore's structure match against a
        preset-default SGD template. Template-free like ``restore_params``,
        but keeps the checkpoint's EMA average (eval --ema's input) instead
        of restarting it."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return state
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore())
        return state.replace(
            params=raw["params"],
            constants=raw["constants"],
            ema_params=raw.get("ema_params"),
            step=raw["step"],
        )

    def restore_params(
        self, state: TrainState, step: Optional[int] = None
    ) -> TrainState:
        """Warm-start: load ONLY params + constants from a checkpoint, keep
        the fresh step/opt_state/rng of ``state`` — the stage transition of
        the paper's §3.2 alternating schedule (each stage re-inits its
        optimizer; the previous stage may have used a different freeze set,
        so its opt_state pytree need not even match this one's). Restores
        the raw saved tree (no template), so it works across optimizer
        configurations; shardings are re-established by the first jitted
        step."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise ValueError(
                "restore_params: no checkpoint found to warm-start from"
            )
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore())
        # EMA tracks the params: warm-starting restarts the average from the
        # loaded weights when this stage keeps EMA on (the saved average —
        # if any — belongs to the previous stage's trajectory). jnp.copy, not
        # an alias: aliased leaves break the train step's donation.
        ema = (jax.tree.map(jax.numpy.copy, raw["params"])
               if state.ema_params is not None else None)
        return state.replace(
            params=raw["params"], constants=raw["constants"], ema_params=ema
        )

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
