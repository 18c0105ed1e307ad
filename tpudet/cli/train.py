"""Training CLI (SURVEY.md C18/C19; reference ``train.py``, call stack 3a).

Example:
  python -m tpudet.cli.train --preset tiny --dataset synthetic --steps 200
  python -m tpudet.cli.train --preset voc_r50 --data-dir /data/voc \
      --steps 80000 --batch-size 16 --checkpoint-dir /ckpt
Supports RPN-only training (3e) via --rpn-only, and the other stages of the
paper's §3.2 alternating schedule via --det-only / --freeze / --init-from
(see README "Training modes").
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import numpy as np

from tpudet.cli.common import add_common_args, config_from_args
from tpudet.data import DataLoader, build_dataset
from tpudet.models import build_model
from tpudet.parallel import batch_sharding, make_mesh
from tpudet.train.checkpoint import CheckpointManager
from tpudet.train.state import create_train_state
from tpudet.train.step import make_train_step
from tpudet.utils.logging import MetricsLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--steps", type=int, default=0, help="override total_steps")
    p.add_argument("--batch-size", type=int, default=0, help="override global batch")
    p.add_argument("--lr", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--logdir", default="")
    p.add_argument("--rpn-only", action="store_true",
                   help="train only the RPN branch (reference 3e mode)")
    p.add_argument("--det-only", action="store_true",
                   help="train only the detection branch over frozen-RPN "
                        "proposals (alternating-training steps 2/4; implies "
                        "freezing rpn_head)")
    p.add_argument("--freeze", default="",
                   help="comma-separated param-subtree prefixes to freeze, "
                        "e.g. 'backbone' or 'backbone,rpn_head' "
                        "(alternating-training steps 3/4)")
    p.add_argument("--init-from", default="",
                   help="checkpoint dir to warm-start params/constants from "
                        "(fresh optimizer/step — the alternating-schedule "
                        "stage transition); unlike --checkpoint-dir restore, "
                        "this does NOT resume opt_state or the step counter")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device step (no mesh sharding)")
    p.add_argument("--log-images-every", type=int, default=0,
                   help="log a GT-annotated training image to TensorBoard "
                        "every N steps (0 = off)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="run mAP eval on the val split every N steps (0 = off)")
    p.add_argument("--eval-max-images", type=int, default=64)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax debug_nans (fails fast on NaN/Inf)")
    p.add_argument("--backbone-weights", default="",
                   help="pretrained backbone .npz (from import_weights."
                        "convert_keras_resnet / convert_torch_resnet + "
                        "save_backbone_npz); applied at init, before any "
                        "checkpoint restore")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = config_from_args(args)
    overrides = {}
    if args.steps:
        overrides["total_steps"] = args.steps
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.lr:
        overrides["learning_rate"] = args.lr
    if args.seed >= 0:
        overrides["seed"] = args.seed
    if args.checkpoint_dir:
        overrides["checkpoint_dir"] = args.checkpoint_dir
    freeze = tuple(s for s in args.freeze.split(",") if s)
    if args.det_only and "rpn_head" not in freeze:
        freeze = freeze + ("rpn_head",)
    if freeze:
        overrides["freeze"] = freeze
    if overrides:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **overrides))
    if args.rpn_only:
        cfg = cfg.replace(rpn_only=True)
    if args.det_only:
        cfg = cfg.replace(det_only=True)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    devices = jax.devices()
    mesh = None
    if not args.no_mesh and len(devices) > 1:
        mesh = make_mesh(cfg.train.num_data_shards, cfg.train.num_model_shards)
        if cfg.train.batch_size % mesh.shape["data"]:
            # Fail loudly here: the device_put would otherwise raise inside
            # the loader's producer thread and hang the main loop forever.
            raise ValueError(
                f"batch_size {cfg.train.batch_size} not divisible by the "
                f"data-mesh size {mesh.shape['data']} — adjust --batch-size "
                "or train.num_data_shards (or pass --no-mesh)"
            )
        print(f"mesh: {mesh.shape}")
    print(f"devices: {devices}")

    model = build_model(cfg)
    rng = jax.random.key(cfg.train.seed)
    state = create_train_state(model, cfg.train, rng)
    if args.backbone_weights:
        from tpudet.models.import_weights import (
            apply_backbone_weights, load_backbone_npz,
        )

        bb_params, bb_constants = load_backbone_npz(args.backbone_weights)
        new_vars = apply_backbone_weights(
            state.variables, bb_params, bb_constants
        )
        state = state.replace(
            params=new_vars["params"],
            constants={k: v for k, v in new_vars.items() if k != "params"},
        )
        print(f"loaded backbone weights from {args.backbone_weights}")
    if mesh is not None:
        from tpudet.parallel.sharding_rules import shard_train_state

        state = shard_train_state(mesh, state)

    if args.init_from:
        # Stage transition of the alternating schedule: previous stage's
        # params, THIS stage's fresh optimizer/step.
        warm = CheckpointManager(args.init_from, keep=1)
        state = warm.restore_params(state)
        warm.close()
        print(f"warm-started params from {args.init_from}")

    ckpt = None
    if cfg.train.checkpoint_dir:
        ckpt = CheckpointManager(cfg.train.checkpoint_dir, cfg.train.keep_checkpoints)
        state = ckpt.restore(state)
        if ckpt.latest_step is not None:
            print(f"restored checkpoint at step {ckpt.latest_step}")
        # Reproducibility record: the fully-resolved config (preset +
        # every CLI/--set override applied) next to the checkpoints.
        import json
        import os

        os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
        with open(os.path.join(cfg.train.checkpoint_dir,
                               "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, sort_keys=True)

    dataset = build_dataset(cfg, split="train")
    print(f"dataset: {cfg.data.dataset}, {len(dataset)} examples")
    loader = DataLoader(
        cfg, dataset, cfg.train.batch_size, shuffle=True, seed=cfg.train.seed,
        sharding=batch_sharding(mesh) if mesh is not None else None,
        augment=True,  # host-side train augmentation (data.scale_jitter)
    )
    step_fn = make_train_step(model, cfg, mesh=mesh, fused_preprocess=True,
                              state_example=state if mesh is not None else None)
    logger = MetricsLogger(args.logdir or None)

    start = int(jax.device_get(state.step))
    eval_dataset = None
    eval_step_fn = None
    best_ckpt = None
    best_map = float("-inf")
    best_record = None
    if ckpt:
        import json
        import os

        # Resume-safe best tracking: without this, a restarted job's first
        # post-resume eval (> -inf) would overwrite a better best/ artifact.
        best_record = os.path.join(cfg.train.checkpoint_dir, "best",
                                   "best_map.json")
        if os.path.exists(best_record):
            with open(best_record) as f:
                best_map = float(json.load(f)["mAP"])
            print(f"resumed best-mAP tracker: {best_map:.4f}")
    stream = iter(loader)
    for step in range(start, cfg.train.total_steps):
        batch = next(stream)
        state, metrics = step_fn(state, batch)
        if (step + 1) % cfg.train.log_every == 0 or step == start:
            logger.log(step + 1, jax.device_get(metrics))
        if args.log_images_every and (step + 1) % args.log_images_every == 0:
            from tpudet.eval.visualize import draw_detections

            img = np.asarray(jax.device_get(batch["image"][0]))
            gtb = np.asarray(jax.device_get(batch["gt_boxes"][0]))
            gtv = np.asarray(jax.device_get(batch["gt_valid"][0]))
            gtc = np.asarray(jax.device_get(batch["gt_classes"][0]))
            drawn = draw_detections(img, gtb[gtv], gtc[gtv])
            logger.log_image(step + 1, "train/ground_truth", drawn)
        if ckpt and (step + 1) % cfg.train.checkpoint_every == 0:
            ckpt.save(state)
        if args.eval_every and (step + 1) % args.eval_every == 0:
            from tpudet.cli.eval import evaluate

            if eval_dataset is None:
                eval_dataset = build_dataset(cfg, split="val")
            if eval_step_fn is None:
                from tpudet.train.step import make_eval_step

                # Built once: a fresh make_eval_step per interval would pay
                # a full XLA recompile of the inference program every eval.
                eval_step_fn = make_eval_step(model, cfg,
                                              fused_preprocess=True)
            # Meshless eval step: mesh-sharded variables must round-trip
            # through host so evaluate() can commit them to one device
            # (mixed device sets would fail under jit).
            eval_vars = (state.variables if mesh is None
                         else jax.device_get(state.variables))
            summary = evaluate(
                cfg, model, eval_vars, eval_dataset,
                batch_size=min(8, cfg.train.batch_size),
                max_images=args.eval_max_images, verbose=False,
                eval_step=eval_step_fn,
            )
            logger.log(step + 1, {"mAP": summary["mAP"]}, prefix="eval")
            if ckpt and summary["mAP"] > best_map:
                # Best-by-eval-mAP tracking: one checkpoint under
                # <checkpoint_dir>/best, overwritten whenever in-training
                # eval improves (the deploy artifact; `latest` remains the
                # resume artifact).
                best_map = summary["mAP"]
                if best_ckpt is None:
                    import os

                    best_ckpt = CheckpointManager(
                        os.path.join(cfg.train.checkpoint_dir, "best"),
                        keep=1,
                    )
                best_ckpt.save(state, force=True)
                import json

                with open(best_record, "w") as f:
                    json.dump({"mAP": best_map, "step": step + 1}, f)
                print(f"new best mAP {best_map:.4f} at step {step + 1} "
                      "-> checkpointed to best/")
    if best_ckpt:
        best_ckpt.wait()
        best_ckpt.close()
    if ckpt:
        ckpt.save(state, force=True)
        ckpt.wait()
        ckpt.close()
    logger.close()
    print("training done.")
    return state


if __name__ == "__main__":
    main()
