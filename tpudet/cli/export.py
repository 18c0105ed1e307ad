"""Model export CLI — AOT-compile the inference program into a standalone
serving artifact (see tpudet/serving/export.py for the artifact contract).

Example:
  python -m tpudet.cli.export --preset voc_r50 --checkpoint-dir /ckpt \
      --batch-size 8 --output model.tpudet --verify
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from tpudet.cli.common import add_common_args, config_from_args
from tpudet.models import build_model
from tpudet.serving import ServingModel, save_artifact
from tpudet.train.checkpoint import CheckpointManager
from tpudet.train.state import create_train_state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument(
        "--platforms", default="",
        help="comma-separated lowering platforms (e.g. 'tpu,cpu'); "
        "default: current backend only",
    )
    p.add_argument(
        "--verify", action="store_true",
        help="reload the artifact and run one synthetic batch through it",
    )
    p.add_argument("--ema", action="store_true",
                   help="export the EMA average of the params")
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(cfg.train.seed))
    if args.checkpoint_dir:
        mgr = CheckpointManager(args.checkpoint_dir)
        if mgr.latest_step is None:
            # Silently shipping random weights with a valid-looking artifact
            # is worse than failing: a typo'd path must not export.
            raise SystemExit(
                f"no checkpoint found in {args.checkpoint_dir!r} — refusing "
                "to export randomly initialized weights (omit "
                "--checkpoint-dir explicitly to export a random-weight "
                "smoke-test artifact)"
            )
        state = mgr.restore_eval(state)
    else:
        print("WARNING: no --checkpoint-dir given — exporting RANDOMLY "
              "INITIALIZED weights (fine for smoke tests, useless for "
              "serving)")
    platforms = (
        [s.strip() for s in args.platforms.split(",") if s.strip()] or None
    )

    meta = save_artifact(
        args.output, cfg, state.eval_variables(args.ema), args.batch_size,
        platforms
    )
    print(f"exported -> {args.output}")
    for k in ("batch_size", "canvas_height", "canvas_width", "num_classes",
              "max_detections", "platforms"):
        print(f"  {k}: {meta[k]}")

    if args.verify:
        serving = ServingModel.load(args.output)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        dets = serving.detect([img], score_thresh=0.0)[0]
        print(
            f"verify: ok — {len(dets['boxes'])} detections on a random image"
        )


if __name__ == "__main__":
    main()
