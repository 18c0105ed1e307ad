"""Shared CLI plumbing: presets for the BASELINE configs + dotted overrides
(mirrors the reference's flag surface — SURVEY.md C23)."""

from __future__ import annotations

import argparse
import ast
import os

# Platform pin for CLI runs: ``TPUDET_PLATFORM=cpu python -m tpudet.cli...``
# forces the backend. Needed because some environments (e.g. this one's
# axon sitecustomize) register a TPU plugin and pin JAX_PLATFORMS at
# interpreter start, overriding the env var a user sets on the command
# line; jax backends initialize lazily, so re-pointing jax.config here —
# the first tpudet import every CLI performs, before any array op — still
# takes effect. Keeps CPU-side jobs (learning proofs, smoke runs) from
# silently becoming TPU clients.
_plat = os.environ.get("TPUDET_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from tpudet.config import (
    AnchorConfig,
    BackboneConfig,
    Config,
    DataConfig,
    ROIConfig,
    RPNConfig,
    TrainConfig,
    apply_overrides,
    tiny_test_config,
)


def preset_config(name: str) -> Config:
    if name == "tiny":
        return tiny_test_config()
    # Aspect-bucketed canvases (see DataConfig): with aspect-preserving
    # resize the short side never exceeds min_size, so canvas short edges
    # only need min_size rounded up to the stride — 640 for VOC (600/1000),
    # 832 for COCO (800/1333). Each image pads onto the best-fitting bucket;
    # square + 4:3 + wide (and portrait mirrors) cover the real aspect mixes
    # at ~85-90% canvas fill vs ~55-73% with one padded shape.
    _VOC_BUCKETS = ((640, 640), (640, 832), (640, 1024),
                    (832, 640), (1024, 640))
    _COCO_BUCKETS = ((832, 832), (832, 1120), (832, 1344),
                     (1120, 832), (1344, 832))
    if name == "voc_r50":
        # BASELINE configs 1–3: ResNet-50 Faster R-CNN on VOC 2007.
        return Config(
            data=DataConfig(dataset="voc", num_classes=20, min_size=600,
                            max_size=1000, canvas_height=1024,
                            canvas_width=1024, aspect_buckets=_VOC_BUCKETS),
            backbone=BackboneConfig(name="resnet50"),
        )
    if name == "voc_vgg16":
        # Paper-canonical Faster R-CNN (arXiv:1506.01497 §4.1: VGG-16,
        # VOC 2007, 600/1000 resize, stride-16 conv5_3 feature, anchors
        # 128/256/512, 4096-dim fc6/fc7 head). ResNet presets remain the
        # perf configs; this one exists for exact paper/reference parity.
        return Config(
            data=DataConfig(dataset="voc", num_classes=20, min_size=600,
                            max_size=1000, canvas_height=1024,
                            canvas_width=1024, aspect_buckets=_VOC_BUCKETS),
            backbone=BackboneConfig(name="vgg16"),
            roi=ROIConfig(fc_dim=4096),
        )
    if name == "coco_r50":
        # BASELINE config 4: COCO 2017, ResNet-50, data-parallel.
        return Config(
            data=DataConfig(dataset="coco", num_classes=80, min_size=800,
                            max_size=1333, canvas_height=1344,
                            canvas_width=1344, aspect_buckets=_COCO_BUCKETS),
            backbone=BackboneConfig(name="resnet50"),
        )
    if name == "coco_r101_fpn":
        # BASELINE config 5: ResNet-101 + FPN, bf16 mixed precision.
        cfg = Config(
            data=DataConfig(dataset="coco", num_classes=80, min_size=800,
                            max_size=1333, canvas_height=1344,
                            canvas_width=1344, aspect_buckets=_COCO_BUCKETS),
            backbone=BackboneConfig(name="resnet101", use_fpn=True,
                                    dtype="bfloat16"),
            anchors=AnchorConfig(),
            # FPN-paper RPN head: one 3x3 conv at the FPN width (256), not
            # the single-level default 512 — the RPN conv runs on P2's full
            # 1/4-resolution grid, where the extra width measured
            # ~14 ms/batch at b=32 for no purpose the FPN protocol wants.
            # Per-level pre-NMS top-k + within-level NMS are on by default
            # in RPNConfig (the FPN/Detectron proposal protocol). Post-NMS:
            # 1000 train (Detectron convention; training pools only the
            # sampled RoIs, so it is cheap) but 300 test — the full
            # Detectron 1000-test setting costs ~3x the RoI-head compute
            # for a sub-point of AP; --set rpn.post_nms_topk_test=1000
            # restores it (the pooler auto-chunks to fit HBM).
            # Blocked exact pre-NMS top-k: bit-identical to lax.top_k
            # (tie order included — legal for training and the eval
            # referee), measured +3.2% (250.0 -> 258.0 img/s/chip b=32 on
            # the real chip) by replacing P2's one ~130k-wide sort with 16
            # parallel 8k-row sorts. Inherited by every preset derived
            # from this one (mask/cascade/keypoint/panoptic).
            rpn=RPNConfig(conv_channels=256, post_nms_topk_train=1000,
                          post_nms_topk_test=300, topk_method="blocked"),
            # Pool-once-per-RoI windowed pooler (no-pack Pallas DMA kernel;
            # window=56 covers these 1344-px canvases at p5): 203 -> 252
            # img/s/chip at b=32 over the all-level masked sum it replaces
            # (KERNELS.md). Value-equivalent to the masked sum under the
            # same fit-bumped level assignment (tested); training pools
            # through the differentiable masked sum with the same
            # assignment. --set roi.pooler=roi_align restores the old
            # default.
            roi=ROIConfig(pooler="roi_align_window", window=56),
        )
        return cfg
    if name == "vitdet_tiny":
        from tpudet.config import tiny_vitdet_config

        return tiny_vitdet_config()
    if name == "coco_vitdet_b":
        # ViTDet-B Faster R-CNN (arXiv:2203.16527 A.2): plain ViT-B/16
        # backbone, window 14 with 4 evenly-spaced global blocks, simple
        # feature pyramid p2-p6 — on the shared COCO pipeline (all COCO
        # bucket dims are multiples of 16). AdamW is the paper's recipe
        # (lr 1e-4, wd 0.1); the blocked top-k + windowed pooler serving
        # path is inherited from the FPN preset it derives from.
        import dataclasses as _dc

        base = preset_config("coco_r101_fpn")
        return base.replace(
            backbone=_dc.replace(
                base.backbone, name="vit_b", freeze_stem=False,
            ),
            train=_dc.replace(
                base.train, optimizer="adamw", learning_rate=1e-4,
                weight_decay=0.1,
            ),
        )
    if name == "coco_maskrcnn_r50_fpn":
        # Mask R-CNN (arXiv:1703.06870 §4.1 canonical: R50-FPN, 14²-pooled
        # mask branch, 4-conv 256ch FCN + deconv to 28² per-class masks):
        # the coco FPN pipeline + mask loading + the mask group's defaults.
        import dataclasses as _dc

        base = preset_config("coco_r101_fpn")
        return base.replace(
            model="mask_rcnn",
            backbone=_dc.replace(base.backbone, name="resnet50"),
            data=_dc.replace(base.data, load_masks=True),
        )
    if name == "maskrcnn_tiny":
        from tpudet.config import tiny_maskrcnn_config

        return tiny_maskrcnn_config()
    if name == "retinanet_tiny":
        from tpudet.config import tiny_retinanet_config

        return tiny_retinanet_config()
    if name == "coco_retinanet_r50":
        # Single-stage RetinaNet-R50-FPN on COCO (paper arXiv:1708.02002 §5
        # canonical settings: P3-P7, sizes 32..512 x {2^0, 2^1/3, 2^2/3}
        # sub-octaves x 3 ratios, 4-conv 256ch shared towers, focal
        # alpha=0.25 gamma=2). Shares the COCO data pipeline with the
        # Faster R-CNN presets.
        return Config(
            model="retinanet",
            data=DataConfig(dataset="coco", num_classes=80, min_size=800,
                            max_size=1333, canvas_height=1344,
                            canvas_width=1344, aspect_buckets=_COCO_BUCKETS),
            backbone=BackboneConfig(name="resnet50", use_fpn=True,
                                    dtype="bfloat16"),
            anchors=AnchorConfig(
                fpn_strides=(8, 16, 32, 64, 128),
                fpn_scales=(32.0, 64.0, 128.0, 256.0, 512.0),
                fpn_octave_scales=(1.0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)),
            ),
            # Focal-loss training needs grad clipping (see
            # tiny_retinanet_config: sparse-positive batches spike the
            # 1/num_pos-normalized gradient into divergence unclipped).
            train=TrainConfig(grad_clip_norm=10.0),
        )
    if name == "fcos_tiny":
        from tpudet.config import tiny_fcos_config

        return tiny_fcos_config()
    if name == "cascade_tiny":
        from tpudet.config import tiny_cascade_config

        return tiny_cascade_config()
    if name == "keypoint_tiny":
        from tpudet.config import tiny_keypoint_config

        return tiny_keypoint_config()
    if name == "panoptic_tiny":
        from tpudet.config import tiny_panoptic_config

        return tiny_panoptic_config()
    if name == "coco_panoptic_r50_fpn":
        # Panoptic FPN R50 (arXiv:1901.02446 §5 canonical: Mask R-CNN
        # R50-FPN + 128ch semantic head, semantic loss weight 0.5). COCO
        # panoptic: 80 things + 53 stuff classes from
        # annotations/panoptic_{split}2017 (json + PNG id maps — see
        # tpudet/data/coco_panoptic.py).
        import dataclasses as _dc

        base = preset_config("coco_maskrcnn_r50_fpn")
        return base.replace(
            model="panoptic_fpn",
            data=_dc.replace(base.data, load_semantic=True,
                             num_stuff_classes=53),
        )
    if name == "coco_keypoint_r50_fpn":
        # Keypoint R-CNN R50-FPN (arXiv:1703.06870 §5 canonical: person-only
        # keypoints, 14²-pooled branch, 8-conv 512ch FCN -> 56² one-hot
        # heatmaps, COCO-17 keypoints/sigmas — the DataConfig defaults).
        # num_classes=1: keypoint training uses person_keypoints_*.json,
        # which is a single-category (person) annotation file.
        import dataclasses as _dc

        base = preset_config("coco_r101_fpn")
        return base.replace(
            model="keypoint_rcnn",
            backbone=_dc.replace(base.backbone, name="resnet50"),
            data=_dc.replace(base.data, load_keypoints=True, num_classes=1),
        )
    if name == "coco_cascade_r50_fpn":
        # Cascade R-CNN R50-FPN on COCO (arXiv:1712.00726 §4 canonical:
        # three stages at IoU 0.5/0.6/0.7, class-agnostic boxes, 10/20/30
        # delta normalization) on the shared COCO FPN pipeline.
        import dataclasses as _dc

        base = preset_config("coco_r101_fpn")
        return base.replace(
            model="cascade_rcnn",
            backbone=_dc.replace(base.backbone, name="resnet50"),
            roi=_dc.replace(base.roi, class_agnostic_bbox=True),
        )
    if name == "coco_fcos_r50":
        # Anchor-free FCOS-R50-FPN on COCO (paper arXiv:1904.01355 §4
        # canonical: P3-P7, regress ranges 64/128/256/512, 4-conv 256ch GN
        # towers, center sampling, centerness-weighted GIoU). Shares the
        # COCO data pipeline with the other presets; only the anchors
        # group's fpn_strides matter to this family.
        from tpudet.config import FCOSConfig

        return Config(
            model="fcos",
            data=DataConfig(dataset="coco", num_classes=80, min_size=800,
                            max_size=1333, canvas_height=1344,
                            canvas_width=1344, aspect_buckets=_COCO_BUCKETS),
            backbone=BackboneConfig(name="resnet50", use_fpn=True,
                                    dtype="bfloat16"),
            anchors=AnchorConfig(fpn_strides=(8, 16, 32, 64, 128)),
            fcos=FCOSConfig(),
            # Same focal-normalizer spike rationale as RetinaNet.
            train=TrainConfig(grad_clip_norm=10.0),
        )
    if name == "detr_tiny":
        from tpudet.config import tiny_detr_config

        return tiny_detr_config()
    if name == "coco_detr_r50":
        # DETR-R50 on COCO (paper arXiv:2005.12872 §4 canonical: d=256,
        # 8 heads, 6+6 layers, 100 queries, costs/weights 1/5/2, eos 0.1,
        # aux losses). Single-scale C5 — no FPN, no anchors, no NMS. The
        # paper trains with AdamW at 1e-4 (1e-5 backbone) for 300 epochs;
        # set train.* accordingly for a real run.
        from tpudet.config import DETRConfig

        return Config(
            model="detr",
            data=DataConfig(dataset="coco", num_classes=80, min_size=800,
                            max_size=1333, canvas_height=1344,
                            canvas_width=1344, aspect_buckets=_COCO_BUCKETS,
                            max_gt_boxes=100),
            backbone=BackboneConfig(name="resnet50", use_fpn=False,
                                    dtype="bfloat16"),
            detr=DETRConfig(),
            # The paper's recipe: AdamW (decoupled decay), transformer lr
            # 1e-4, backbone 1e-5 (factor 0.1), grad clip 0.1.
            train=TrainConfig(optimizer="adamw", learning_rate=1e-4,
                              weight_decay=1e-4, grad_clip_norm=0.1,
                              backbone_lr_factor=0.1),
        )
    if name == "deformable_detr_tiny":
        from tpudet.config import tiny_deformable_detr_config

        return tiny_deformable_detr_config()
    if name == "coco_deformable_detr_r50":
        # Deformable-DETR-R50 on COCO (paper arXiv:2010.04159 §5 canonical:
        # d=256, 8 heads, 6+6 layers, FFN 1024, 300 queries, 4 levels x 4
        # points, focal matching at cost 2/5/2, iterative box refinement).
        # Multi-scale C3..C5 + a stride-64 extra level via its OWN
        # projections — no FPN module, no anchors, no NMS. The paper trains
        # AdamW at 2e-4 (backbone and offset/reference heads at 0.1x) for
        # 50 epochs.
        from tpudet.config import DeformableDETRConfig

        return Config(
            model="deformable_detr",
            data=DataConfig(dataset="coco", num_classes=80, min_size=800,
                            max_size=1333, canvas_height=1344,
                            canvas_width=1344, aspect_buckets=_COCO_BUCKETS,
                            max_gt_boxes=100),
            backbone=BackboneConfig(name="resnet50", use_fpn=False,
                                    dtype="bfloat16"),
            # sampling_gather="mxu": the one-hot MXU kernel is the measured
            # best EXACT-math sampling path on chip (infer 6.11 vs flat
            # 0.54 / patch 2.82 img/s/chip; train 2.1 vs 0.16 — KERNELS.md
            # "Deformable attention" part 5; tier-test chip-proven, custom
            # VJP). Non-TPU lowerings fall back to the flat gather
            # automatically. shared_sampling_locations stays off (model
            # fidelity to the paper's per-head sampling; the shared variant
            # measured 6.85 img/s AND beat the per-head synthetic proof
            # 0.747 vs 0.553 — opt in with BOTH
            # --set deformable_detr.sampling_gather=patch AND
            # --set deformable_detr.shared_sampling_locations=True;
            # shared locations require the patch gather).
            deformable_detr=DeformableDETRConfig(with_box_refine=True,
                                                 sampling_gather="mxu"),
            train=TrainConfig(optimizer="adamw", learning_rate=2e-4,
                              weight_decay=1e-4, grad_clip_norm=0.1,
                              backbone_lr_factor=0.1),
        )
    raise ValueError(f"unknown preset {name!r}")


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--preset", default="voc_r50",
                   choices=["tiny", "voc_r50", "voc_vgg16", "coco_r50",
                            "coco_r101_fpn", "retinanet_tiny",
                            "coco_retinanet_r50", "maskrcnn_tiny",
                            "coco_maskrcnn_r50_fpn", "fcos_tiny",
                            "coco_fcos_r50", "cascade_tiny",
                            "coco_cascade_r50_fpn", "keypoint_tiny",
                            "coco_keypoint_r50_fpn", "panoptic_tiny",
                            "coco_panoptic_r50_fpn", "detr_tiny",
                            "coco_detr_r50", "deformable_detr_tiny",
                            "vitdet_tiny", "coco_vitdet_b",
                            "coco_deformable_detr_r50"])
    p.add_argument("--data-dir", default="", help="dataset root")
    p.add_argument("--dataset", default="",
                   help="override dataset type (voc|coco|nuimages|synthetic)")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="dotted config override, e.g. --set rpn.nms_thresh=0.6",
    )


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = preset_config(args.preset)
    overrides = {}
    if args.data_dir:
        overrides["data.data_dir"] = args.data_dir
    if args.dataset:
        overrides["data.dataset"] = args.dataset
        if args.dataset == "synthetic" and args.preset != "tiny":
            overrides.setdefault("data.num_classes", 8)
    for item in args.set:
        key, _, raw = item.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        overrides[key.strip()] = value
    return apply_overrides(cfg, overrides)
