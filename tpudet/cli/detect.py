"""Single-image detection CLI (SURVEY.md C22; BASELINE config 1 — the "PR1"
single-image inference path).

Example:
  python -m tpudet.cli.detect --preset voc_r50 --checkpoint-dir /ckpt \
      --image dog.jpg --output out.png --score-thresh 0.5
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpudet.cli.common import add_common_args, config_from_args
from tpudet.cli.eval import rescale_to_original
from tpudet.data.preprocess import prepare_example
from tpudet.data.voc import VOC_CLASSES
from tpudet.eval.visualize import draw_detections
from tpudet.models import build_model
from tpudet.train.checkpoint import CheckpointManager
from tpudet.train.state import create_train_state
from tpudet.train.step import make_eval_step


def detect_image(cfg, model, variables, image: np.ndarray):
    """[h, w, 3] uint8 -> detections in original-image coordinates."""
    ex = prepare_example(
        cfg.data, image, np.zeros((0, 4), np.float32), np.zeros(0, np.int32)
    )
    batch = {
        "image": jnp.asarray(ex["image"][None]),
        "image_hw": jnp.asarray(ex["image_hw"][None]),
    }
    step = make_eval_step(model, cfg, fused_preprocess=True)
    out = jax.device_get(step(variables, batch))
    valid = out["valid"][0]
    boxes = rescale_to_original(
        out["boxes"][0][valid], ex["image_scale"], ex["orig_hw"]
    )
    # Box-frame mask probabilities (Mask R-CNN): rescaling to original
    # coordinates is carried entirely by the boxes.
    masks = out["masks"][0][valid] if "masks" in out else None
    if "keypoints" in out:
        from tpudet.data.preprocess import rescale_keypoints_to_original

        keypoints = rescale_keypoints_to_original(
            out["keypoints"][0][valid], ex["image_scale"], ex["orig_hw"]
        )
    else:
        keypoints = None
    return (boxes, out["scores"][0][valid], out["classes"][0][valid],
            masks, keypoints)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--image", required=True)
    p.add_argument("--output", default="detections.png")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--score-thresh", type=float, default=0.5)
    p.add_argument("--ema", action="store_true",
                   help="use the EMA average of the params")
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    if args.checkpoint_dir:
        state = CheckpointManager(args.checkpoint_dir).restore_eval(state)

    boxes, scores, classes, masks, keypoints = detect_image(
        cfg, model, state.eval_variables(args.ema), image
    )
    keep = scores >= args.score_thresh
    boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
    if masks is not None:
        masks = masks[keep]
    if keypoints is not None:
        keypoints = keypoints[keep]
    names = VOC_CLASSES if cfg.data.dataset == "voc" else None
    annotated = draw_detections(image, boxes, classes, scores, names,
                                masks=masks, keypoints=keypoints)

    Image.fromarray(annotated).save(args.output)
    print(f"{len(boxes)} detections -> {args.output}")
    for b, s, c in zip(boxes, scores, classes):
        label = names[c - 1] if names else str(int(c))
        print(f"  {label:14s} {s:.3f}  [{b[0]:.1f}, {b[1]:.1f}, {b[2]:.1f}, {b[3]:.1f}]")


if __name__ == "__main__":
    main()
