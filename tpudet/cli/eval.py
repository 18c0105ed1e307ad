"""Evaluation CLI: mAP over a validation split (SURVEY.md C20; call stack 3c).

Example:
  python -m tpudet.cli.eval --preset voc_r50 --data-dir /data/voc \
      --split test --checkpoint-dir /ckpt
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from tpudet.cli.common import add_common_args, config_from_args
from tpudet.data import DataLoader, build_dataset
from tpudet.data.voc import VOC_CLASSES
from tpudet.eval.metrics import CocoStyleEvaluator, DetectionEvaluator
from tpudet.models import build_model
from tpudet.train.checkpoint import CheckpointManager
from tpudet.train.state import create_train_state
from tpudet.train.step import make_eval_step


# Shared inverse-resize helper (also used by cli/detect and serving);
# re-exported here for backward compatibility.
from tpudet.data.preprocess import rescale_to_original  # noqa: F401,E402


def _tta_knobs(cfg):
    """(nms_thresh, max_detections) of the family's final postprocess — the
    TTA merge re-runs the same suppression over the doubled candidate set."""
    group = {"retinanet": cfg.retinanet,
             "fcos": getattr(cfg, "fcos", None)}.get(cfg.model) or cfg.roi
    return group.nms_thresh, group.max_detections


def evaluate(cfg, model, variables, dataset, batch_size=8, max_images=-1,
             class_names=None, verbose=True, metric_style="voc", mesh=None,
             save_json="", eval_step=None, tta=""):
    """Run 3c: batched inference + host-side mAP accumulation.

    With ``mesh`` the batch is data-parallel-sharded over the 'data' axis
    (XLA partitions the whole inference program; detections come back
    batch-sharded and are fetched to host for the evaluator).

    ``eval_step`` lets callers that evaluate repeatedly (the train CLI's
    --eval-every) reuse one compiled step across calls instead of paying a
    fresh XLA compile each interval.

    ``tta="hflip"`` runs a second predict on each mirrored canvas and
    merges the unflipped candidates with the originals through the
    family's per-class NMS (tpudet/eval/tta.py) — roughly 2x eval cost."""
    if tta not in ("", "hflip"):
        raise ValueError(f"unknown tta {tta!r} (use '' or 'hflip')")
    if eval_step is None:
        eval_step = make_eval_step(model, cfg, mesh=mesh, fused_preprocess=True)
    flip_fn = None
    if tta:
        from tpudet.eval.tta import flip_batch

        flip_fn = jax.jit(flip_batch)
    # Commit host variables to device once, not once per batch.
    if mesh is None:
        variables = jax.device_put(variables)
    sharding = None
    if mesh is not None:
        from tpudet.parallel import batch_sharding

        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"eval batch_size {batch_size} not divisible by data-mesh "
                f"size {mesh.shape['data']}"
            )
        sharding = batch_sharding(mesh)
    if metric_style == "proposal_recall":
        # RPN analysis (paper §4): caller should evaluate with
        # cfg.rpn_only=True so predict() emits class-agnostic proposals.
        from tpudet.eval.metrics import ProposalRecallEvaluator

        evaluator = ProposalRecallEvaluator()
    elif metric_style == "coco":
        evaluator = CocoStyleEvaluator(cfg.data.num_classes,
                                       class_names=class_names)
    else:
        evaluator = DetectionEvaluator(
            cfg.data.num_classes, iou_thresh=cfg.eval.iou_thresh,
            interpolation=cfg.eval.ap_interpolation, class_names=class_names,
        )
    # Instance segmentation (Mask R-CNN): a second evaluator of the same
    # protocol matching on pasted-mask IoU; its metrics land under "segm/"
    # (the box metrics keep their plain names — they are the parity
    # referee's). Needs data.load_masks so GT crops ride in the batch.
    # Pose estimation (Keypoint R-CNN): OKS-matched keypoint mAP (a COCO
    # protocol — pycocotools has no VOC-style keypoint eval) under "kp/".
    kp_evaluator = None
    if cfg.model == "keypoint_rcnn" and metric_style in ("voc", "coco"):
        if not cfg.data.load_keypoints:
            print("eval: model emits keypoints but data.load_keypoints="
                  "False — skipping keypoint mAP (no GT keypoints)")
        elif len(cfg.data.keypoint_sigmas) != cfg.data.num_keypoints:
            raise ValueError(
                f"data.keypoint_sigmas has {len(cfg.data.keypoint_sigmas)} "
                f"entries but num_keypoints={cfg.data.num_keypoints}"
            )
        else:
            kp_evaluator = CocoStyleEvaluator(
                cfg.data.num_classes, class_names=class_names,
                iou_type="keypoints",
                keypoint_sigmas=cfg.data.keypoint_sigmas,
            )
    # Panoptic FPN: PQ/SQ/RQ + semantic mIoU under "panoptic/" — fusion and
    # matching run host-side at the semantic branch's 1/4 scale.
    pan_evaluator = None
    if cfg.model == "panoptic_fpn" and metric_style in ("voc", "coco"):
        if not (cfg.data.load_semantic and cfg.data.load_masks):
            print("eval: panoptic model without load_semantic/load_masks — "
                  "skipping PQ")
        else:
            from tpudet.eval.panoptic import PanopticEvaluator

            pan_evaluator = PanopticEvaluator(
                cfg.data.num_stuff_classes, cfg.data.num_classes
            )
    segm_evaluator = None
    if cfg.model in ("mask_rcnn", "panoptic_fpn") \
            and metric_style in ("voc", "coco"):
        if not cfg.data.load_masks:
            print("eval: model emits masks but data.load_masks=False — "
                  "skipping segm mAP (no GT masks in the batch)")
        elif metric_style == "coco":
            segm_evaluator = CocoStyleEvaluator(
                cfg.data.num_classes, class_names=class_names,
                iou_type="segm",
            )
        else:
            segm_evaluator = DetectionEvaluator(
                cfg.data.num_classes, iou_thresh=cfg.eval.iou_thresh,
                interpolation=cfg.eval.ap_interpolation,
                class_names=class_names, iou_type="segm",
            )
    # Explicitly unsharded: every process evaluates the FULL split (the
    # evaluator has no cross-process aggregation; identical full-split
    # numbers on each host beat silently-partial per-host numbers).
    loader = DataLoader(cfg, dataset, batch_size, shuffle=False,
                        drop_last=False, process_index=0, process_count=1)

    def submitted():
        """Enqueue-ahead: dispatch is async, so yielding (host_batch,
        in-flight device output) pairs overlaps the next batch's host prep
        + dispatch with the device executing the current one (the
        synchronous fetch per batch previously serialized the two and paid
        the full per-step dispatch latency on top of device time)."""
        for batch in loader.batches(0):
            batch_valid = batch.pop("batch_valid", np.ones(batch_size, bool))
            if sharding is not None:
                jb = jax.device_put(batch, sharding)
            else:
                jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
            flipped_out = (eval_step(variables, flip_fn(jb))
                           if flip_fn is not None else None)
            yield batch, batch_valid, eval_step(variables, jb), flipped_out

    # COCO-format results export: [{image_id, category_id, bbox xywh,
    # score}]. image_id comes from dataset.image_id(index) when available
    # (COCO: original ids; VOC: filename stems), else the dataset index;
    # category_id from dataset.category_id(cls) (COCO: original category
    # ids), else the contiguous class index.
    results = [] if save_json else None
    get_image_id = getattr(dataset, "image_id", lambda i: int(i))
    get_cat_id = getattr(dataset, "category_id", lambda c: int(c))

    seen = 0
    pending = []
    stream = submitted()
    done = False
    while not done or pending:
        while not done and len(pending) < 3:
            try:
                pending.append(next(stream))
            except StopIteration:
                done = True
        if not pending:  # zero batches in the split
            break
        batch, batch_valid, out_dev, flip_dev = pending.pop(0)
        out = jax.device_get(out_dev)
        fout = None
        if flip_dev is not None:
            from tpudet.eval.tta import unflip_detections

            fout = unflip_detections(
                jax.device_get(flip_dev), batch["image_hw"],
                flip_pairs=getattr(cfg.data, "keypoint_flip_pairs", ()),
            )
        for i in range(len(batch_valid)):
            if not batch_valid[i] or (0 <= max_images <= seen):
                continue
            seen += 1
            if fout is None:
                v = out["valid"][i]
                det = {k: np.asarray(out[k][i])[v]
                       for k in ("boxes", "scores", "classes", "masks",
                                 "keypoints") if k in out}
            else:
                from tpudet.eval.tta import merge_detections

                nms_t, max_d = _tta_knobs(cfg)
                det = merge_detections(out, fout, i, nms_t, max_d)
            boxes = rescale_to_original(
                det["boxes"], batch["image_scale"][i], batch["orig_hw"][i],
            )
            gt_valid = batch["gt_valid"][i]
            gt_boxes = rescale_to_original(
                batch["gt_boxes"][i][gt_valid], batch["image_scale"][i],
                batch["orig_hw"][i],
            )
            # Keypoints rescale ONCE per image; both the results export and
            # the OKS evaluator consume the same original-coordinate array.
            det_kps = None
            if "keypoints" in det:
                from tpudet.data.preprocess import (
                    rescale_keypoints_to_original,
                )

                det_kps = rescale_keypoints_to_original(
                    det["keypoints"],
                    batch["image_scale"][i], batch["orig_hw"][i],
                )
            if results is not None:
                img_id = get_image_id(int(batch["example_index"][i]))
                scores_i = det["scores"]
                classes_i = det["classes"]
                masks_i = (det["masks"]
                           if "masks" in det else [None] * len(boxes))
                kps_i = det_kps if det_kps is not None else [None] * len(boxes)
                for b, s, c, mk, kp in zip(boxes, scores_i, classes_i,
                                           masks_i, kps_i):
                    rec = {
                        "image_id": img_id,
                        "category_id": get_cat_id(int(c)),
                        "bbox": [float(b[0]), float(b[1]),
                                 float(b[2] - b[0]), float(b[3] - b[1])],
                        "score": float(s),
                    }
                    if mk is not None:
                        # pycocotools-consumable compressed RLE in
                        # ORIGINAL-image pixels (boxes already rescaled).
                        from tpudet.data.masks import mask_to_rle

                        rec["segmentation"] = mask_to_rle(
                            mk, b, batch["orig_hw"][i]
                        )
                    if kp is not None:
                        # COCO results format: flat [x1, y1, c1, ...] —
                        # the third slot carries the per-keypoint softmax
                        # confidence (the Detectron results convention;
                        # COCOeval itself ignores it, so consumers can
                        # threshold on it without affecting kp/mAP).
                        rec["keypoints"] = [
                            float(v)
                            for v in np.asarray(kp, np.float64).reshape(-1)
                        ]
                    results.append(rec)
            gt_difficult = batch.get("gt_difficult")
            gt_crowd = batch.get("gt_crowd")
            gt_area = batch.get("gt_area")
            extra = {}
            if isinstance(evaluator, CocoStyleEvaluator):
                # COCO protocol: GT binned by the annotation area field,
                # which lives in ORIGINAL-image pixels — matching the
                # rescaled-to-original boxes used here.
                extra["gt_area"] = (None if gt_area is None
                                    else gt_area[i][gt_valid])
            common = dict(
                gt_difficult=None if gt_difficult is None
                else gt_difficult[i][gt_valid],
                gt_crowd=None if gt_crowd is None
                else gt_crowd[i][gt_valid],
            )
            evaluator.add_image(
                boxes, det["scores"], det["classes"],
                gt_boxes, batch["gt_classes"][i][gt_valid],
                **common, **extra,
            )
            if segm_evaluator is not None:
                # Masks are box-frame, so the original-coordinate rescale is
                # carried entirely by the boxes; the crops paste unchanged.
                segm_evaluator.add_image(
                    boxes, det["scores"], det["classes"],
                    gt_boxes, batch["gt_classes"][i][gt_valid],
                    pred_masks=det["masks"],
                    gt_masks=batch["gt_masks"][i][gt_valid],
                    **common, **extra,
                )
            if pan_evaluator is not None:
                from tpudet.eval.panoptic import fuse_panoptic, gt_panoptic

                pc = cfg.panoptic
                s_count = cfg.data.num_stuff_classes
                # Fusion runs in CANVAS coordinates (det["boxes"] before
                # the original-image rescale) against the 1/4-scale
                # semantic map.
                pseg, psegs = fuse_panoptic(
                    det["boxes"], det["scores"], det["classes"],
                    det["masks"], out["semantic"][i], s_count,
                    overlap_thresh=pc.overlap_thresh,
                    stuff_min_area=pc.stuff_min_area,
                    score_thresh=pc.instance_score_thresh,
                )
                gseg, gsegs = gt_panoptic(
                    batch["gt_boxes"][i][gt_valid],
                    batch["gt_classes"][i][gt_valid],
                    batch["gt_masks"][i][gt_valid],
                    batch["gt_semantic"][i], s_count,
                )
                pan_evaluator.add_image(
                    pseg, psegs, gseg, gsegs,
                    pred_semantic=out["semantic"][i],
                    gt_semantic=batch["gt_semantic"][i],
                )
            if kp_evaluator is not None:
                from tpudet.data.preprocess import (
                    rescale_keypoints_to_original,
                )

                kp_evaluator.add_image(
                    boxes, det["scores"], det["classes"],
                    gt_boxes, batch["gt_classes"][i][gt_valid],
                    pred_keypoints=det_kps,
                    gt_keypoints=rescale_keypoints_to_original(
                        batch["gt_keypoints"][i][gt_valid],
                        batch["image_scale"][i], batch["orig_hw"][i],
                    ),
                    **common, **extra,
                )
        if 0 <= max_images <= seen:
            break
    del pending, stream
    if results is not None:
        import json

        with open(save_json, "w") as f:
            json.dump(results, f)
        if verbose:
            print(f"wrote {len(results)} detections to {save_json}")
    summary = evaluator.summarize()
    if segm_evaluator is not None:
        summary.update({
            f"segm/{k}": v for k, v in segm_evaluator.summarize().items()
        })
    if kp_evaluator is not None:
        summary.update({
            f"kp/{k}": v for k, v in kp_evaluator.summarize().items()
        })
    if pan_evaluator is not None:
        summary.update({
            f"panoptic/{k}": v
            for k, v in pan_evaluator.summarize().items()
        })
    if verbose:
        for k, v in sorted(summary.items()):
            print(f"{k}: {v:.4f}")
    return summary


def referee_config(cfg):
    """The evaluator is the parity referee: pin every throughput-oriented
    approximation back to the protocol-exact formulation.

    - ``roi.max_nms_candidates`` sentinel 0 → -1: ALL P*C (box, class)
      candidates enter the final per-class NMS, like the reference's
      dynamic-shape postprocess (``--set roi.max_nms_candidates=1024``
      restores the serving cap here).
    - ``rpn.topk_method="approx"`` never runs under the referee; "blocked"
      is exempt — bit-identical to ``lax.top_k`` incl. tie order
      (tpudet/ops/selection.py).
    - RetinaNet's class-max prefilter is exact up to a tie-containment
      caveat (RetinaNetConfig.prefilter): "auto" → "off" so the referee
      runs the paper's flattened selection; an explicit "on" survives.
    """
    import dataclasses

    if cfg.roi.max_nms_candidates == 0:
        cfg = cfg.replace(
            roi=dataclasses.replace(cfg.roi, max_nms_candidates=-1)
        )
    if cfg.rpn.topk_method not in ("exact", "blocked"):
        print("eval: forcing rpn.topk_method=exact (parity referee)")
        cfg = cfg.replace(
            rpn=dataclasses.replace(cfg.rpn, topk_method="exact")
        )
    if cfg.model == "retinanet" and cfg.retinanet.prefilter == "auto":
        cfg = cfg.replace(
            retinanet=dataclasses.replace(cfg.retinanet, prefilter="off")
        )
    return cfg


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--split", default="val")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--max-images", type=int, default=-1)
    p.add_argument("--metric", default="",
                   choices=["", "voc", "coco", "proposal-recall"],
                   help="default: coco for COCO datasets, voc otherwise. "
                        "proposal-recall runs the RPN-analysis table "
                        "(recall of GT at IoU 0.5/0.7 by top-k proposals; "
                        "forces rpn_only predict)")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device eval (no data-parallel sharding)")
    p.add_argument("--save-json", default="",
                   help="write detections as a COCO-format results json")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the EMA average of the params "
                        "(train.ema_decay > 0 during training)")
    p.add_argument("--tta", default="", choices=["", "hflip"],
                   help="test-time augmentation: also predict on each "
                        "mirrored image and merge the candidates (~2x cost)")
    args = p.parse_args(argv)
    cfg = referee_config(config_from_args(args))

    model = build_model(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    # Template-free eval restore: loads params/constants/EMA regardless of
    # the train-time optimizer config (no opt_state structure match), and a
    # checkpoint carrying an EMA average restores it even when the eval
    # config didn't enable EMA; --ema on an average-less checkpoint fails
    # with the clean eval_variables error below.
    if args.checkpoint_dir:
        mgr = CheckpointManager(args.checkpoint_dir)
        state = mgr.restore_eval(state)
        print(f"restored step {mgr.latest_step}")

    dataset = build_dataset(cfg, split=args.split)
    names = VOC_CLASSES if cfg.data.dataset == "voc" else getattr(
        dataset, "class_names", None
    )
    # COCO-style mAP@[.5:.95] is also the community convention for nuImages
    # 2D boxes; VOC keeps its own devkit protocol.
    metric = args.metric or (
        "coco" if cfg.data.dataset in ("coco", "nuimages") else "voc"
    )
    if metric == "proposal-recall":
        # Proposal analysis needs the RPN's class-agnostic outputs, with
        # enough survivors to fill the top-k table (paper-canonical 300
        # test proposals would truncate recall@1000).
        if cfg.model != "faster_rcnn":
            raise SystemExit(
                "--metric proposal-recall analyses the RPN's proposals; "
                f"model={cfg.model!r} has no proposal stage"
            )
        metric = "proposal_recall"
        import dataclasses

        cfg = cfg.replace(
            rpn_only=True,
            rpn=dataclasses.replace(
                cfg.rpn,
                post_nms_topk_test=max(cfg.rpn.post_nms_topk_test, 1000),
            ),
            # rpn_only predict truncates its output to roi.max_detections;
            # lift it too or recall@300/@1000 silently collapse to
            # recall@max_detections (default 100).
            roi=dataclasses.replace(
                cfg.roi,
                max_detections=max(cfg.roi.max_detections, 1000),
            ),
        )
        model = build_model(cfg)
    mesh = None
    # Mesh eval is single-controller only: each process evaluates the full
    # split independently (see evaluate()), so a cross-host mesh would both
    # contradict that and make device_get fail on non-addressable shards.
    if (not args.no_mesh and jax.process_count() == 1
            and len(jax.local_devices()) > 1):
        from tpudet.parallel import make_mesh

        data = len(jax.local_devices())
        if args.batch_size % data == 0:
            mesh = make_mesh(num_data=data, num_model=1)
            print(f"mesh: {dict(mesh.shape)}")
        else:
            print(f"eval: --batch-size {args.batch_size} not divisible by "
                  f"{data} devices — running single-device (pass a multiple "
                  "to enable data-parallel eval)")
    summary = evaluate(
        cfg, model, state.eval_variables(args.ema), dataset,
        batch_size=args.batch_size,
        max_images=args.max_images, class_names=names, metric_style=metric,
        mesh=mesh, save_json=args.save_json, tta=args.tta,
    )
    return summary


if __name__ == "__main__":
    main()
