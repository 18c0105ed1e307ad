"""Configuration tree for tpudet.

Mirrors the knob surface of the TF2 Faster R-CNN reference
(``antoineBarbez/2D_object_detection`` — see SURVEY.md C23; the reference mount
was empty during the survey, so knob names follow the canonical Faster R-CNN /
Fast R-CNN papers [arXiv:1506.01497 §3, arXiv:1504.08083 §2] which the
reference implements): anchor scales/ratios, pre/post-NMS top-k, NMS
thresholds, fg/bg IoU thresholds, sampler sizes/fractions, LR schedule, paths.

All configs are frozen dataclasses so they can be closed over by ``jax.jit``
traces safely (hashable, immutable); anything shape-determining lives here so
compiled programs have fully static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline (reference layer L1 — SURVEY.md C1–C4)."""

    dataset: str = "voc"  # "voc" | "coco" | "synthetic"
    data_dir: str = ""
    split: str = "train"
    num_classes: int = 20  # foreground classes (VOC=20, COCO=80)
    # Aspect-preserving resize: min side / max side (Fast R-CNN §2.2 canonical
    # 600/1000; defaults here are TPU-friendly multiples of the stride).
    min_size: int = 600
    max_size: int = 1000
    # Static canvas the resized image is padded onto. XLA requires static
    # shapes; every image becomes (canvas_height, canvas_width, 3) plus masks.
    canvas_height: int = 1024
    canvas_width: int = 1024
    # Orientation-bucketed canvases: instead of one square canvas, landscape
    # images pad onto (canvas_short, canvas_width) and portrait ones onto
    # (canvas_height, canvas_short), and the loader groups batches by
    # orientation. Two static shapes -> two XLA executables, ~1.3-1.7x fewer
    # padded pixels per batch on VOC/COCO-shaped data. Requires the dataset
    # to expose ``example_hw(i)`` (all bundled datasets do).
    orientation_buckets: bool = False
    canvas_short: int = 768
    # Generalized aspect-ratio bucketing (supersedes orientation_buckets when
    # non-empty): each entry is an (h, w) canvas; every image goes to the
    # bucket that fits its resized shape with the fewest padded pixels, and
    # the loader groups batches per bucket. N static shapes -> N XLA
    # executables; typical VOC/COCO aspect mixes fill ~85-90% of the canvas
    # vs ~55-73% with a single padded shape. Requires dataset.example_hw(i).
    aspect_buckets: Tuple[Tuple[int, int], ...] = ()
    # GT boxes are padded to this many per image with a validity mask.
    max_gt_boxes: int = 100
    # Per-channel normalization (ImageNet RGB means/stds).
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    # Augmentation: random horizontal flip (the only augmentation in the
    # reference, per Faster R-CNN §3.1.3).
    random_flip: bool = True
    shuffle_buffer: int = 1000
    # Host JPEG front-end: "auto" uses the native C++ fused
    # decode+resize+pad (tpudet/native) when it builds and the dataset
    # exposes raw JPEGs, else PIL; "native" requires it; "pil" disables it.
    decoder: str = "auto"
    # Let libjpeg IDCT-scale to the smallest M/8 size covering the resize
    # target before the exact resample (decode cost tracks output pixels).
    # Approximate (mean pixel diff < 3 vs the exact decode — tested); for
    # bit-stable cross-machine eval comparisons set this False or
    # decoder="pil".
    fast_jpeg_scale: bool = True
    # Instance masks (Mask R-CNN branch): when True the loader emits
    # ``gt_masks`` [max_gt_boxes, gt_mask_size, gt_mask_size] uint8 —
    # each GT's mask rasterized in its own box frame (resize-invariant,
    # ~12 KB/instance instead of O(canvas) full-image masks; see
    # tpudet/data/masks.py). Datasets without mask annotations emit zeros.
    load_masks: bool = False
    gt_mask_size: int = 112
    # Semantic-segmentation loading (Panoptic FPN): emit gt_semantic
    # [canvas_h/4, canvas_w/4] int32 class maps (0 = the void/unlabeled
    # ignore label, 1..num_stuff_classes = stuff, then things rendered on
    # top as num_stuff_classes + thing_class). Stored at the semantic
    # branch's 1/4-scale loss resolution (nearest-neighbor downsample,
    # host-side) — a full-res map would be 16x the bytes for no extra
    # training signal.
    load_semantic: bool = False
    num_stuff_classes: int = 1  # synthetic: one background-stuff class
    # Keypoint loading (Keypoint R-CNN): emit gt_keypoints [max_gt_boxes,
    # num_keypoints, 3] = (x, y, v) in canvas coords, v the COCO visibility
    # (0 unlabeled, 1 labeled-invisible, 2 visible). Datasets without
    # keypoint annotations emit zeros.
    load_keypoints: bool = False
    num_keypoints: int = 17  # COCO person convention
    # Left/right keypoint index pairs swapped under horizontal flip (COCO
    # person: eyes/ears/shoulders/elbows/wrists/hips/knees/ankles).
    keypoint_flip_pairs: Tuple[Tuple[int, int], ...] = (
        (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
        (15, 16),
    )
    # Per-keypoint OKS falloff constants (pycocotools' sigmas; COCO-17
    # person defaults). Must have num_keypoints entries when evaluating.
    keypoint_sigmas: Tuple[float, ...] = (
        0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
        0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
    )
    # Train-time photometric augmentation (brightness, contrast, saturation,
    # hue), all-zero disables. Device-side, fused into the jitted train step
    # like the flip: brightness/contrast/saturation factors ~ U(1-x, 1+x),
    # hue rotation ~ U(-h, +h) turns (0.5 = 180deg) applied as a YIQ-space
    # rotation (one 3x3 pixel matmul - no HSV conversion on device).
    # Padding stays exactly zero and the contrast/saturation grayscale means
    # are computed over the valid region only. Typical SSD/TF-OD recipe:
    # (0.125, 0.5, 0.5, 0.05).
    color_jitter: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    # Train-time multi-scale augmentation: each image's resize scale is
    # multiplied by U(lo, hi) (standard COCO multiscale, e.g. (0.8, 1.0)).
    # Host-side and deterministic per (seed, epoch, index); the canvas/
    # bucket choice uses the UNJITTERED size, so the static shapes and the
    # cross-process bucket plan are unaffected (factors are clamped so the
    # jittered image still fits its canvas). Applied only by loaders
    # constructed with augment=True (the train CLI's); eval never jitters.
    scale_jitter: Tuple[float, float] = (1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """Conv feature extractor (SURVEY.md C5, C24)."""

    name: str = "resnet50"  # "resnet50" | "resnet101" | "tiny" (tests)
    # Feature pyramid. False → single C4-style stride-16 feature map like the
    # reference; True → FPN P2–P6 (build-only requirement, SURVEY.md C24).
    use_fpn: bool = False
    # Freeze the stem + first stage and all batch-norm statistics, standard
    # detection fine-tuning practice (Faster R-CNN §3.2).
    freeze_stem: bool = True
    # "frozen_bn" (pretrained stats folded to constants) or "gn" (stateless,
    # for from-scratch training). Trainable BN is deliberately absent: its
    # per-device batch stats diverge across a data-parallel mesh without
    # cross-replica sync; GN is the TPU-native answer.
    norm: str = "frozen_bn"
    # 1x1 conv reducing the single-scale c4 feature (1024ch) before the RoI
    # path. Cuts RoI-align gather traffic and the first head FC by 4x on TPU
    # (the RoI path is HBM-bound); 0 disables. FPN necks to 256 already.
    neck_channels: int = 256
    # Compute dtype for conv/matmul tiers. bf16 keeps the MXU fed at double
    # rate on TPU; params stay f32.
    dtype: str = "float32"  # "float32" | "bfloat16"
    # Downsampling-stride placement in bottleneck blocks: True = the
    # original/Keras/caffe convention (matches the reference's
    # keras.applications weights); False = torchvision "v1.5" (required when
    # importing torch weights via import_weights.convert_torch_resnet).
    stride_in_1x1: bool = True
    # Space-to-depth stem: exactly equivalent 4x4/s1 conv on a block-2
    # space-to-depth image instead of the MXU-starved 7x7/s2 3-channel conv
    # (see models/resnet.py::stem_kernel_to_s2d). Weight layouts interconvert.
    s2d_stem: bool = False
    # Rematerialize backbone blocks on the backward pass (jax.checkpoint):
    # trades recompute FLOPs for backbone-activation HBM so larger per-chip
    # training batches fit. Values are unchanged; inference is unaffected.
    remat: bool = False
    # ViTDet knobs (name in {"vit_s","vit_b","vit_l","vit_tiny"} — Li et
    # al., arXiv:2203.16527; models/vit.py). Window side for windowed
    # attention blocks; every k-th block attends globally (depth 12, k=3 ->
    # the paper's 4 evenly-spaced global blocks); side of the square
    # positional-embedding parameter grid (resized to the canvas token grid
    # at trace time, so checkpoints are canvas-independent).
    vit_window: int = 14
    vit_global_attn_every: int = 3
    vit_pos_grid: int = 64


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor grid (SURVEY.md C6; Faster R-CNN §3.1.1: k=9 anchors/cell)."""

    # sqrt(area) of the base anchors in input pixels.
    scales: Tuple[float, ...] = (128.0, 256.0, 512.0)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    stride: int = 16
    # FPN mode: one scale per level, strides (4..64); scales here are then the
    # per-level base scale multipliers.
    fpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    fpn_scales: Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0, 512.0)
    # Per-level octave multipliers applied to each fpn_scale (RetinaNet's
    # {2^0, 2^(1/3), 2^(2/3)} sub-octave anchors, arXiv:1708.02002 §4).
    # The Faster R-CNN FPN protocol keeps the single (1.0,) octave.
    fpn_octave_scales: Tuple[float, ...] = (1.0,)

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.scales) * len(self.aspect_ratios)

    @property
    def num_fpn_anchors_per_cell(self) -> int:
        return len(self.fpn_octave_scales) * len(self.aspect_ratios)


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    """Region proposal network head + proposal generation + RPN targets
    (SURVEY.md C9–C11; Faster R-CNN §3.1–3.3)."""

    conv_channels: int = 512
    # Proposal generation (§3.3): decode → clip → min-size filter → top-k by
    # score pre-NMS → NMS@nms_thresh → top-N post-NMS. Static shapes: outputs
    # are padded to post_nms_topk with a validity mask.
    pre_nms_topk_train: int = 12000
    post_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 6000
    post_nms_topk_test: int = 300
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    # FPN proposal protocol (FPN paper / Detectron convention; active only
    # with an FPN backbone): pre-NMS top-k is taken PER LEVEL and NMS
    # suppresses only within a level (cross-level boxes never suppress each
    # other); the post-NMS top-N is then taken across the union by score.
    # Set the test knob to 0 to fall back to global top-k + NMS over the
    # concatenated pyramid.
    fpn_pre_nms_topk_per_level_train: int = 2000
    fpn_pre_nms_topk_per_level_test: int = 1000
    # Target assignment (§3.1.2): pos if IoU > fg_thresh OR argmax per GT;
    # neg if IoU < bg_thresh; else ignored.
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    # Minibatch sampling (§3.1.3): 256 anchors, up to 1:1 pos:neg.
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    # Loss balancing: L = cls/N_cls + lambda * reg/N_reg (§3.1.2).
    loss_weight_box: float = 1.0
    # Box-delta coder weights for the RPN (canonically all ones).
    box_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    # Ignore anchors crossing the image boundary during training (§3.1.3).
    ignore_cross_boundary: bool = True
    # Pre-NMS top-k selection method at inference:
    #   "exact"  — jax.lax.top_k (protocol-exact; the default, and what the
    #              eval CLI always uses so the mAP referee never deviates)
    #   "blocked" — ops.selection.blocked_top_k: exact two-stage selection
    #              (per-block batched sort + short merge), bit-identical to
    #              lax.top_k including tie order, so it is legal for
    #              training and the eval referee alike. Replaces the full
    #              ~130k-wide P2 sort with 16 parallel 8k-row sorts.
    #   "approx" — jax.lax.approx_max_k, TPU PartialReduce-based partial
    #              selection tuned to topk_recall_target. A serving knob:
    #              per-level top-k over the P2 grid is the dominant
    #              non-conv cost of FPN proposal generation and the
    #              near-threshold proposals approx may drop are fed to NMS
    #              anyway. Training always selects exactly.
    topk_method: str = "exact"
    topk_recall_target: float = 0.95
    # First-stage row width for topk_method="blocked" (per-block batched
    # sort). 8192 keeps rows lane-friendly; blocked_top_k falls back to
    # lax.top_k whenever blocking cannot win at the given operand size.
    topk_block_size: int = 8192


@dataclasses.dataclass(frozen=True)
class ROIConfig:
    """RoI feature extraction + Fast R-CNN head + detection targets +
    inference post-processing (SURVEY.md C12–C14, C16)."""

    # RoI feature extractor backend:
    #   "roi_align"         — MXU formulation (separable-weight einsums;
    #                         fastest measured on v5e, the default)
    #   "roi_align_pallas"  — Pallas gather kernel (VMEM-resident features)
    #   "roi_align_gather"  — pure-jnp 4-corner gathers (oracle)
    #   "roi_align_packed"  — FPN-only variant: all levels packed into one
    #                         feature tensor, ONE einsum pair (exact; measured
    #                         0.94x the default's per-level masked-sum on v5e
    #                         — kept as the documented negative result)
    #   "roi_align_window"  — FPN-only pool-once-per-RoI: one static
    #                         [window, window, C] tile sliced per RoI at its
    #                         assigned level (packed pyramid), einsums
    #                         against the tile — ~20x fewer pooling FLOPs
    #                         than the all-level masked sum. Level
    #                         assignment is fit-bumped for extreme-aspect
    #                         slivers (ops/roi_align.py::fpn_assign_levels).
    #   "crop_and_resize"   — TF convention (the float-tolerance parity oracle)
    # All "roi_align*" backends compute identical values (tested; _window
    # under its fit-bumped level assignment).
    pooler: str = "roi_align"
    output_size: int = 7
    sampling_ratio: int = 2  # samples per bin side for roi_align
    # Tile side (feature cells) for pooler="roi_align_window"; multiple of
    # 8 (TPU DMA sublane alignment). Must satisfy
    # max(canvas_h, canvas_w)/32 <= window - 12 so every RoI fits a tile at
    # p5 (checked at model build); 56 covers the 1344-px COCO canvases.
    window: int = 56
    # Windowed-pooler batching formulation (pooler="roi_align_window" on a
    # TPU lowering only). True = ONE pallas_call whose grid covers all B*N
    # RoIs (image index rides the scalar-prefetched origins); False = vmap
    # over the per-image kernel, which lowers to a per-image while loop
    # around a B=1 grid. ADJUDICATED round 4 (interleaved same-session A/B
    # on the chip, coco_r101_fpn b=32 infer): batched 243.43 / 244.40
    # img/s/chip, vmap 259.13 — the round-3 prediction that one flat grid
    # saves ~2.2 ms of loop scaffolding was WRONG on hardware (see
    # KERNELS.md "Batched windowed pooler — adjudicated" for the why); the
    # per-image formulation is the default and the batched grid stays
    # gated here with its measurements.
    window_batched: bool = False
    # Pool RoIs in sequential chunks of this size (lax.map) to bound the
    # gather workspace: peak memory ~ B * chunk * (S*ratio)^2 * C instead of
    # B * R * (...). 0 disables chunking. Applies ONLY to the
    # "roi_align_gather" backend — the others keep modest intermediates and
    # the sequential chunk loop costs far more than it saves (measured
    # 27 ms/batch at b=32 on v5e).
    pooler_chunk: int = 64
    # Per-image budget (MB) for the MXU-einsum pooler's [R, s, dim, C]
    # contraction intermediate. RoIs are chunked (lax.map) only when the
    # estimate exceeds this — e.g. 1000 proposals on an FPN P2 map at 832²
    # would otherwise materialize ~24 GB batched and OOM a 16 GB HBM.
    # 0 disables chunking. 256 MB/img ≈ 8 GB at b=32 (known to fit).
    mxu_chunk_budget_mb: int = 256
    # Fast R-CNN head (Fast R-CNN §2.1): two hidden FCs.
    fc_dim: int = 1024
    # Detection target assignment (Fast R-CNN §2.3).
    fg_iou_thresh: float = 0.5
    bg_iou_thresh_hi: float = 0.5
    bg_iou_thresh_lo: float = 0.0
    batch_size_per_image: int = 128
    positive_fraction: float = 0.25
    # Append GT boxes to proposals during training so some fg always exists.
    append_gt: bool = True
    # Box-delta coder weights for the second stage (Fast R-CNN convention).
    box_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    # Per-class box regression (Fast R-CNN) vs class-agnostic.
    class_agnostic_bbox: bool = False
    # Inference post-processing (SURVEY.md C16): per-class decode → score
    # threshold → per-class NMS → global top-k detections.
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    max_detections: int = 100
    # Final-NMS formulation: "hard" (greedy suppression — the reference
    # protocol) or "soft_linear"/"soft_gaussian" (Soft-NMS, arXiv:1704.04503:
    # overlapping detections are RESCORED by the decay instead of removed —
    # an eval/serving accuracy knob, off by default; detections below
    # score_thresh after decay are dropped). soft_nms_sigma is the gaussian
    # method's temperature (the paper's default 0.5).
    nms_method: str = "hard"
    soft_nms_sigma: float = 0.5
    # Cap on flattened (box, class) candidates entering the final per-class
    # NMS (top-k by score first; static shape). 0 -> the built-in default
    # (1024, the serving/throughput setting); -1 -> EXACT: all P*C
    # candidates enter NMS (what the TF2 reference's dynamic-shape
    # postprocess does — the eval CLI forces this so the parity referee has
    # no protocol deviation). In dense scenes a candidate below a finite
    # cap could survive exact per-class NMS.
    max_nms_candidates: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer, schedule, loop, checkpointing (SURVEY.md C17–C19)."""

    batch_size: int = 2  # global batch size (per optimizer update)
    # Gradient accumulation: split each global batch into accum_steps
    # microbatches, lax.scan the forward/backward over them inside the one
    # jitted step, and apply a single averaged optimizer update. Lets the
    # effective batch exceed the per-chip HBM sweet spot (b=16 on v5e for
    # coco_r101_fpn — see KERNELS.md batch-scaling study) without paying
    # remat recompute. batch_size % accum_steps == 0 and the microbatch must
    # still divide the data-parallel mesh axis.
    accum_steps: int = 1
    # "sgd" | "adam" | "adamw" — adamw is DECOUPLED decay (optax.adamw,
    # torch-AdamW semantics); sgd/adam apply weight_decay as coupled L2
    # added to the gradient before the optimizer core.
    optimizer: str = "sgd"
    learning_rate: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # Per-group LR: scale the backbone subtree's updates by this factor
    # (fine-tuning recipes train a pretrained backbone slower — DETR's
    # canonical recipe is transformer 1e-4 / backbone 1e-5, i.e. 0.1).
    # 1.0 = single LR. Applied after the optimizer core, so it scales the
    # whole update (weight-decay step included), matching torch
    # param-group-lr semantics.
    backbone_lr_factor: float = 1.0
    # LR schedule after warmup: "step" (lr * gamma at each milestone, the
    # reference's schedule) or "cosine" (half-cosine from learning_rate to
    # lr_min_factor * learning_rate at total_steps; milestones/gamma unused).
    lr_schedule: str = "step"
    lr_min_factor: float = 0.0
    # Step LR schedule: lr * gamma at each milestone step.
    lr_milestones: Tuple[int, ...] = (60000,)
    lr_gamma: float = 0.1
    warmup_steps: int = 500
    warmup_factor: float = 1.0 / 3.0
    total_steps: int = 80000
    # Exponential moving average of the params (serving-quality weights —
    # the TF OD API's ema_decay 0.9998 convention). 0 disables. When on,
    # the train step maintains state.ema_params (decay ramps in as
    # min(ema_decay, (1 + step)/(10 + step)) so early steps do not pin the
    # average to the random init); eval/export CLIs select it via --ema.
    ema_decay: float = 0.0
    grad_clip_norm: float = 0.0  # 0 disables
    seed: int = 0
    # Checkpointing (orbax): save every N steps, keep last k, restore-on-start.
    checkpoint_dir: str = ""
    checkpoint_every: int = 1000
    keep_checkpoints: int = 3
    log_every: int = 20
    # Mesh: data-parallel size (-1 → all devices), model axis reserved for TP.
    num_data_shards: int = -1
    num_model_shards: int = 1
    # Mixed precision for the forward/backward compute path.
    bf16: bool = False
    # Param-subtree freezing (Faster R-CNN §3.2 alternating training):
    # slash-joined param-tree prefixes excluded from optimization — e.g.
    # ("backbone",) for the stage-3 RPN fine-tune, ("backbone", "rpn_head")
    # for the stage-4 detector fine-tune. Frozen leaves' gradients are
    # zeroed at the optimizer entry (XLA then dead-code-eliminates their
    # backward cone) and their updates are re-zeroed after weight decay, so
    # frozen params stay bit-identical across steps. Unknown prefixes raise
    # at optimizer init.
    freeze: Tuple[str, ...] = ()


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    """Single-stage RetinaNet branch (Lin et al., arXiv:1708.02002 — a build
    extra beyond the two-stage reference, demonstrating the framework's
    components compose into other detector families): FPN P3–P7, conv heads
    shared across levels, sigmoid focal loss over ALL anchors (no sampling —
    the loss handles the fg/bg imbalance, which also removes the only
    data-dependent-shape stage of two-stage training)."""

    # Head towers (paper §4: four 3x3 convs at 256ch per tower, shared
    # across pyramid levels).
    num_convs: int = 4
    head_channels: int = 256
    # Classification bias init: every anchor starts predicting foreground
    # probability prior_prob, keeping the focal loss finite at step 0 over
    # ~100k mostly-background anchors (paper §3.3, "prior" π = 0.01).
    prior_prob: float = 0.01
    # Focal loss FL(p_t) = -α_t (1 − p_t)^γ log(p_t) (paper Eq. 4–5).
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Target assignment (paper §4): fg at IoU >= 0.5, bg below 0.4, the
    # band in between ignored; every GT also claims its best anchor
    # (low-quality matches), same argmax rule as the RPN matcher.
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.4
    # Box regression: smooth-L1 on positive anchors, normalized by the
    # positive count like the classification term.
    smooth_l1_beta: float = 0.11
    loss_weight_box: float = 1.0
    box_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    # Inference (paper §4): per level, keep the top-k (anchor, class)
    # candidates above score_thresh, decode those, then one class-aware NMS
    # over the union of levels.
    pre_nms_topk: int = 1000
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    max_detections: int = 100
    # Selection formulation for the per-level top-k. The paper's selection
    # is over the FLATTENED (cell, anchor, class) axis — at P3 on the
    # 1344-px COCO canvas that is 168*104*9*80 ≈ 12.6M entries per image
    # (≈20.3M over levels), enormous sort traffic to keep 1000 candidates
    # (measured 82.65 img/s/chip, 0.44x the flagship target — KERNELS.md
    # "RetinaNet ... selection pathology"). The prefilter takes one VPU max
    # over the class axis, top-k over the per-(cell,anchor) maxima (~253k
    # over levels), gathers only the k survivors' class rows and re-selects
    # over k*C. Containment: exact unless one cell hosts 2+ of the level's
    # top-k (anchor, class) pairs AND thereby displaces another cell
    # entirely — negligible at k=1000 and impossible for the final
    # detections unless those pairs also survive score_thresh + NMS.
    #   "auto" — prefilter on; the eval CLI (parity referee) pins it off
    #   "on"   — prefilter unconditionally
    #   "off"  — paper-exact flattened selection
    prefilter: str = "auto"
    # Final-NMS formulation (see ROIConfig.nms_method): "hard" |
    # "soft_linear" | "soft_gaussian".
    nms_method: str = "hard"
    soft_nms_sigma: float = 0.5


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    """Cascade R-CNN branch (Cai & Vasconcelos, arXiv:1712.00726 — a build
    extra beyond the single-IoU reference): a sequence of detection heads
    trained at increasing IoU thresholds, each refining the previous stage's
    boxes, so each stage sees a progressively higher-quality proposal
    distribution (the paper's answer to the IoU-threshold paradox).

    TPU-first formulation: stage 1 uses the shared balanced sampler; later
    stages keep the SAME static RoI set and only re-label it at their higher
    threshold (the paper does no resampling — the regressed boxes raise the
    fg fraction naturally), so the whole cascade is one static-shape
    program. Box regression is class-agnostic per stage (required for the
    box chain; the reference Detectron configuration)."""

    # Per-stage fg IoU thresholds (also the stage count). Stage 1 additionally
    # uses roi.bg_iou_thresh_lo/hi semantics via the shared sampler.
    stage_iou_thresholds: Tuple[float, ...] = (0.5, 0.6, 0.7)
    # Per-stage box-delta normalization: tighter boxes -> tighter stds
    # (the paper/Detectron schedule).
    stage_box_reg_weights: Tuple[Tuple[float, float, float, float], ...] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )
    # Per-stage loss weights (paper: equal).
    stage_loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    """Anchor-free FCOS branch (Tian et al., arXiv:1904.01355 — a build
    extra beyond the anchor-based reference families): per-location
    classification + (l, t, r, b) distance regression + centerness on the
    P3–P7 pyramid. The natural TPU formulation of the three families — no
    anchors to materialize at all, no matcher, no sampling: the per-location
    assignment is a dense static [points, gt] computation, and the box loss
    (1 − GIoU on decoded boxes) needs no delta-encoding convention."""

    # Shared head towers (paper §3.1: four 3x3 convs + GroupNorm per tower).
    num_convs: int = 4
    head_channels: int = 256
    # GroupNorm in the towers (the paper's heads; "none" disables).
    head_norm: str = "gn"
    prior_prob: float = 0.01
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Assignment (paper §3.2 + the center-sampling improvement): a location
    # is a candidate for a GT when it lies within radius*stride of the GT
    # center (0 = the paper's original anywhere-inside-the-box rule) AND its
    # max regression distance falls in the level's range; ties resolve to
    # the minimal-area GT.
    center_sampling_radius: float = 1.5
    # Per-level max-distance bounds: level i regresses targets in
    # (bounds[i-1], bounds[i]] with bounds[-1] = inf; len == len(fpn_strides)
    # - 1 (paper: 64/128/256/512 for P3..P7).
    regress_range_bounds: Tuple[float, ...] = (64.0, 128.0, 256.0, 512.0)
    loss_weight_box: float = 1.0
    loss_weight_ctr: float = 1.0
    # Inference: per level, top-k over the (location, class) product of the
    # class and centerness sigmoids, then one class-aware NMS (paper §3.1:
    # centerness downweights low-quality border predictions before NMS).
    pre_nms_topk: int = 1000
    score_thresh: float = 0.05
    nms_thresh: float = 0.6
    max_detections: int = 100
    # Final-NMS formulation (see ROIConfig.nms_method): "hard" |
    # "soft_linear" | "soft_gaussian".
    nms_method: str = "hard"
    soft_nms_sigma: float = 0.5


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Mask R-CNN instance-segmentation branch (He et al., arXiv:1703.06870
    — a build extra beyond the box-only reference, demonstrating the RoI
    machinery extends to per-pixel prediction): a small FCN over RoI features
    predicting one m x m sigmoid mask per class, trained with per-pixel BCE
    on the matched class only (§3, "decoupled mask and class prediction").

    TPU-first formulation: mask targets are computed ON DEVICE from the
    loader's box-frame GT crops with a separable bilinear einsum
    (ops/masks.py) — no dynamic shapes anywhere; the head runs on exactly
    the foreground-capable prefix of the RoI sample (the balanced sampler
    emits positives first), a static count."""

    # FCN tower (paper §3 / Detectron: four 3x3 convs at 256ch + 2x deconv).
    num_convs: int = 4
    conv_channels: int = 256
    # RoI features pooled at this resolution for the mask branch (paper: 14,
    # vs 7 for the box head); the deconv doubles it, so predicted masks are
    # [2 * roi_output_size]² per class (28² canonically).
    roi_output_size: int = 14
    loss_weight: float = 1.0
    # Class-agnostic masks (one mask instead of one per class): nearly as
    # accurate per the paper (§4.3) and C× cheaper in head FLOPs/params.
    class_agnostic: bool = False
    # Binarization threshold when pasting predicted masks (eval/visualize).
    binarize_thresh: float = 0.5


@dataclasses.dataclass(frozen=True)
class PanopticConfig:
    """Panoptic FPN branch (Kirillov et al., arXiv:1901.02446 — a build
    extra beyond the box-only reference): a lightweight semantic FCN over
    the FPN levels fused with the Mask R-CNN instance branch by the paper's
    deterministic merge heuristic.

    Semantic head (paper §3): each of p2..p5 goes through (n_l) 3x3
    conv+GN+ReLU stages, the coarser levels bilinearly 2x-upsampled per
    stage, all summed at 1/4 scale, then a 1x1 conv to the semantic classes
    (stuff + things + void at index 0 as the ignore label). Loss is
    per-pixel CE at 1/4 resolution against the loader's downsampled map."""

    conv_channels: int = 128
    loss_weight: float = 0.5  # paper's lambda for the semantic term
    # Panoptic fusion (paper §4 / the panoptic-API heuristic, host-side):
    # paste instances by score, drop an instance when more than
    # overlap_thresh of it is already claimed; keep a stuff segment only if
    # >= stuff_min_area pixels survive.
    overlap_thresh: float = 0.5
    stuff_min_area: int = 64
    instance_score_thresh: float = 0.5


@dataclasses.dataclass(frozen=True)
class KeypointConfig:
    """Keypoint R-CNN branch (He et al., arXiv:1703.06870 §5 — a build extra
    beyond the box-only reference): a per-RoI FCN predicting one heatmap per
    keypoint; each visible keypoint trains as a softmax over the heatmap
    grid (one-hot at its cell — the paper's formulation).

    TPU-first: targets are grid INDICES computed on device from the RoI and
    the matched GT keypoints (pure arithmetic, no rasterization); the head
    runs on the balanced sampler's positives-first static prefix exactly
    like the mask branch."""

    # FCN tower (paper §5 / Detectron: 8 convs at 512ch).
    num_convs: int = 8
    conv_channels: int = 512
    # RoI features pooled at this resolution; the deconv doubles it and a
    # final 2x bilinear upsample doubles again (14 -> 28 -> 56 canonically).
    roi_output_size: int = 14
    loss_weight: float = 1.0


@dataclasses.dataclass(frozen=True)
class DETRConfig:
    """DETR set-prediction branch (Carion et al., arXiv:2005.12872 — a
    build extra beyond the convolutional reference families): transformer
    encoder over the C5 token grid + decoder over learned object queries,
    trained with Hungarian-matched set losses, NO anchors / NMS / RoI
    pooling anywhere.

    TPU-first formulation: the bipartite matching runs INSIDE the jitted
    step (exact Jonker–Volgenant in ``ops/hungarian.py`` — the canonical
    implementations host-callback scipy every step), attention masks and
    sine embeddings derive from each image's true extent so geometry is
    canvas-padding-invariant, and the whole program is dense static-shape
    batched matmuls on the MXU."""

    # Transformer (paper appendix: d=256, 8 heads, 6+6 layers, FFN 2048).
    d_model: int = 256
    num_heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    num_queries: int = 100
    dropout: float = 0.1
    # Matching cost weights (paper §2: class prob + L1 + GIoU at 1/5/2).
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    # Loss weights mirror the costs; eos_coef down-weights the no-object
    # class in the CE (paper: 0.1 — queries are mostly unmatched).
    loss_weight_class: float = 1.0
    loss_weight_bbox: float = 5.0
    loss_weight_giou: float = 2.0
    eos_coef: float = 0.1
    # Deep supervision: the set loss on every decoder layer's output
    # through the shared heads (paper §3.4, ~+2 mAP).
    aux_loss: bool = True
    # Inference: top-k over the (query, class) posterior; no NMS (the set
    # loss trains queries not to duplicate).
    score_thresh: float = 0.05
    max_detections: int = 100


@dataclasses.dataclass(frozen=True)
class DeformableDETRConfig:
    """Deformable DETR branch (Zhu et al., arXiv:2010.04159 — a build extra
    beyond the convolutional reference families): multi-scale deformable
    attention over C3..C5 + extra strided levels, focal-matched set loss,
    reference-point box regression with optional per-layer iterative
    refinement.

    TPU-first formulation shared with ``detr``: exact in-jit Hungarian
    matching, canvas-padding-invariant geometry via valid-extent positional
    embeddings and per-level valid-ratio coordinate scaling, dense
    static-shape programs throughout (the deformable sampling is one fused
    XLA gather per head — see ``ops/deform_attn.py``)."""

    # Transformer (paper §5: d=256, 8 heads, 6+6 layers, FFN 1024,
    # 300 queries, 4 levels x 4 points).
    d_model: int = 256
    num_heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 1024
    num_queries: int = 300
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    # Iterative bounding-box refinement (paper §4.4): per-layer heads,
    # each decoder layer re-estimates the box around the previous layer's
    # detached output.
    with_box_refine: bool = False
    # Matching cost weights (appendix A.4: focal class cost at 2, L1 5,
    # GIoU 2) and the matching loss weights (same ratios).
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    loss_weight_class: float = 2.0
    loss_weight_bbox: float = 5.0
    loss_weight_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    aux_loss: bool = True
    # Inference: top-k over the flattened (query, class) sigmoid scores.
    score_thresh: float = 0.05
    max_detections: int = 100
    # Bilinear-sampling formulation — "flat" (rank-2 embedding-style XLA
    # gather, one 64 B row per corner), "patch" (one 2x2 corner patch per
    # sample: 4x fewer gather indices), or "mxu" (one-hot matmul Pallas
    # kernel, kernels/deform_attn_mxu.py — no gathers at all; falls back
    # to "flat" off-TPU). All exact-equivalent math
    # (tests/test_deformable_detr.py, test_deform_attn_mxu.py); the
    # default follows the chip adjudication (KERNELS.md "Deformable
    # attention" series).
    sampling_gather: str = "flat"
    # Share sampling locations across attention heads (Lite-DETR-style
    # efficiency variant, 4*H x fewer gather indices; attention weights
    # stay per-head). Changes parameter shapes — NOT the paper
    # architecture, so off everywhere except explicitly-opted presets.
    # Requires sampling_gather="patch".
    shared_sampling_locations: bool = False
    # Query-tile height of the one-hot MXU sampling kernel (samples per
    # grid step = tile * num_points). Larger tiles amortize per-step
    # overheads over bigger matmuls at more VMEM per step; 128 is the
    # chip-adjudicated default (A/B at COCO b=16: infer 6.31 vs 6.11,
    # train 2.20 vs 2.15 img/s — KERNELS.md "Deformable attention" 5).
    mxu_query_tile: int = 128


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """mAP evaluation (SURVEY.md C20)."""

    iou_thresh: float = 0.5
    # "all_points" (VOC2010+/COCO-style) or "11_points" (VOC2007).
    ap_interpolation: str = "11_points"
    max_images: int = -1


@dataclasses.dataclass(frozen=True)
class Config:
    # Detector family: "faster_rcnn" (the reference's two-stage pipeline),
    # "mask_rcnn" (two-stage + instance-mask FCN branch), "retinanet"
    # (single-stage anchor-based, FPN P3-P7 + focal loss), or "fcos"
    # (single-stage anchor-FREE, per-location regression + centerness). The
    # rpn/roi groups configure the two-stage families (mask adds the mask
    # group), the retinanet/fcos groups the single-stage ones;
    # data/backbone/anchors/train/eval are shared (fcos uses only the
    # anchors group's fpn_strides).
    model: str = "faster_rcnn"
    data: DataConfig = DataConfig()
    backbone: BackboneConfig = BackboneConfig()
    anchors: AnchorConfig = AnchorConfig()
    rpn: RPNConfig = RPNConfig()
    roi: ROIConfig = ROIConfig()
    retinanet: RetinaNetConfig = RetinaNetConfig()
    fcos: FCOSConfig = FCOSConfig()
    cascade: CascadeConfig = CascadeConfig()
    detr: DETRConfig = DETRConfig()
    deformable_detr: DeformableDETRConfig = DeformableDETRConfig()
    mask: MaskConfig = MaskConfig()
    keypoint: KeypointConfig = KeypointConfig()
    panoptic: PanopticConfig = PanopticConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()
    # Use Pallas kernels for NMS / RoI Align / decode+top-k where available;
    # False falls back to the pure-jnp XLA reference path.
    use_pallas: bool = True
    # Train/evaluate only the RPN branch (the reference's standalone RPN mode,
    # SURVEY.md 3e — the RPN as a class-agnostic detector).
    rpn_only: bool = False
    # Train only the detection branch over proposals from a fixed RPN (the
    # Fast R-CNN stage of the paper's §3.2 alternating schedule — steps 2/4;
    # step 4 additionally freezes the backbone). Requires "rpn_head" in
    # train.freeze: the RPN receives no loss gradient in this mode, so
    # leaving it unfrozen would only expose it to weight decay (enforced at
    # make_train_step). Mutually exclusive with rpn_only.
    det_only: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def tiny_test_config(
    canvas: int = 128,
    num_classes: int = 3,
    use_fpn: bool = False,
) -> Config:
    """Small config for unit tests / CPU: tiny backbone, small canvas."""
    return Config(
        data=DataConfig(
            dataset="synthetic",
            num_classes=num_classes,
            min_size=canvas,
            max_size=canvas,
            canvas_height=canvas,
            canvas_width=canvas,
            max_gt_boxes=10,
        ),
        backbone=BackboneConfig(name="tiny", use_fpn=use_fpn, norm="gn",
                                freeze_stem=False),
        anchors=AnchorConfig(scales=(32.0, 64.0), aspect_ratios=(0.5, 1.0, 2.0)),
        rpn=RPNConfig(
            conv_channels=64,
            pre_nms_topk_train=512,
            post_nms_topk_train=128,
            pre_nms_topk_test=256,
            post_nms_topk_test=64,
            batch_size_per_image=64,
        ),
        roi=ROIConfig(fc_dim=64, batch_size_per_image=32, max_detections=20),
        train=TrainConfig(batch_size=2, checkpoint_every=10**9),
        use_pallas=False,
    )


def tiny_vitdet_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small ViTDet config for unit tests / CPU: vit_tiny (dim 32, 2
    blocks, window 4 with the second block global) + the simple feature
    pyramid, over the standard tiny two-stage knobs. 128px canvas ->
    8x8 token grid -> pos_grid 8 (no trace-time resize in the common
    case; a different canvas exercises the bilinear resize path)."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        backbone=dataclasses.replace(
            base.backbone, name="vit_tiny", use_fpn=True,
            vit_window=4, vit_global_attn_every=2, vit_pos_grid=8,
        ),
    )


def tiny_retinanet_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small RetinaNet config for unit tests / CPU: tiny backbone (c3..c5 at
    strides 8/16/32, same as ResNet), P6/P7 grown from c5 by stride-2 convs
    exactly like the paper's ResNet variant."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="retinanet",
        backbone=dataclasses.replace(base.backbone, use_fpn=True),
        anchors=AnchorConfig(
            aspect_ratios=(0.5, 1.0, 2.0),
            # RetinaNet levels P3..P7 on the tiny backbone's strides.
            fpn_strides=(8, 16, 32, 64, 128),
            fpn_scales=(16.0, 32.0, 64.0, 96.0, 128.0),
            fpn_octave_scales=(1.0, 1.26),
        ),
        # 2x64 towers: the 1x32 head optimizes fine on a fixed batch but
        # generalizes an order of magnitude slower from scratch (CPU study:
        # mAP 0.0001 vs 0.164 at 3000 steps, same budget otherwise).
        retinanet=RetinaNetConfig(
            num_convs=2, head_channels=64, pre_nms_topk=64,
            max_detections=20,
        ),
        # Focal-loss training needs clipping: the per-image 1/num_pos
        # normalizer amplifies sparse-positive batches into grad spikes
        # (observed: norm 5 -> 118 -> 1.3e4 -> NaN within 20 steps on this
        # config unclipped — the TF OD API ships RetinaNet with clip 10 for
        # the same reason).
        train=dataclasses.replace(base.train, grad_clip_norm=10.0),
    )


def tiny_cascade_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small Cascade R-CNN config for unit tests / CPU: the tiny two-stage
    config + the cascade group's defaults (class-agnostic boxes forced —
    the box chain requires one box per proposal)."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="cascade_rcnn",
        roi=dataclasses.replace(base.roi, class_agnostic_bbox=True),
    )


def tiny_fcos_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small FCOS config for unit tests / CPU: tiny backbone + P3-P7 (same
    pyramid as the tiny RetinaNet), narrow GN towers, regress ranges scaled
    to the 128px canvas."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="fcos",
        backbone=dataclasses.replace(base.backbone, use_fpn=True),
        anchors=AnchorConfig(fpn_strides=(8, 16, 32, 64, 128)),
        fcos=FCOSConfig(
            num_convs=2, head_channels=64, pre_nms_topk=64,
            max_detections=20,
            regress_range_bounds=(16.0, 32.0, 64.0, 96.0),
        ),
        # Same rationale as the RetinaNet preset: the focal 1/num_pos
        # normalizer amplifies sparse-positive batches into grad spikes.
        train=dataclasses.replace(base.train, grad_clip_norm=10.0),
    )


def tiny_maskrcnn_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small Mask R-CNN config for unit tests / CPU: the tiny two-stage
    config + mask loading and a narrow mask FCN."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="mask_rcnn",
        data=dataclasses.replace(base.data, load_masks=True, gt_mask_size=28),
        mask=MaskConfig(num_convs=2, conv_channels=32, roi_output_size=7),
    )


def tiny_keypoint_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small Keypoint R-CNN config for unit tests / CPU: the tiny two-stage
    config + 5 synthetic keypoints (center + 4 edge midpoints; pair (1, 2)
    is the left/right midpoints) and a narrow keypoint FCN."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="keypoint_rcnn",
        data=dataclasses.replace(
            base.data, load_keypoints=True, num_keypoints=5,
            keypoint_flip_pairs=((1, 2),),
            keypoint_sigmas=(0.1, 0.1, 0.1, 0.1, 0.1),
        ),
        keypoint=KeypointConfig(num_convs=2, conv_channels=32,
                                roi_output_size=7),
    )


def tiny_panoptic_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small Panoptic FPN config for unit tests / CPU: the tiny Mask R-CNN
    config (FPN on — the semantic head consumes p2..p5) + semantic loading
    and a narrow semantic FCN."""
    base = tiny_maskrcnn_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="panoptic_fpn",
        backbone=dataclasses.replace(base.backbone, use_fpn=True),
        data=dataclasses.replace(base.data, load_semantic=True),
        panoptic=PanopticConfig(conv_channels=32, stuff_min_area=16),
    )


def tiny_detr_config(canvas: int = 128, num_classes: int = 3) -> Config:
    """Small DETR config for unit tests / CPU: tiny backbone (C5 stride 32
    -> a 4x4 token grid at 128px), a narrow 2+2-layer transformer, 20
    queries, dropout off (CPU tests are deterministic; the paper's 0.1 is
    for the 300-epoch COCO recipe)."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="detr",
        detr=DETRConfig(
            d_model=32, num_heads=4, enc_layers=2, dec_layers=2,
            ffn_dim=64, num_queries=20, dropout=0.0, max_detections=20,
        ),
    )


def tiny_deformable_detr_config(
    canvas: int = 128, num_classes: int = 3
) -> Config:
    """Small Deformable DETR config for unit tests / CPU: tiny backbone
    (C3..C5 at strides 8/16/32 -> 16x16 / 8x8 / 4x4 token grids at 128px +
    one extra stride-64 level), a narrow 2+2-layer transformer, 20 queries,
    2 points, dropout off."""
    base = tiny_test_config(canvas=canvas, num_classes=num_classes)
    return base.replace(
        model="deformable_detr",
        deformable_detr=DeformableDETRConfig(
            d_model=32, num_heads=4, enc_layers=2, dec_layers=2,
            ffn_dim=64, num_queries=20, num_levels=4, num_points=2,
            dropout=0.0, max_detections=20,
        ),
    )


def apply_overrides(cfg: Config, overrides: dict) -> Config:
    """Apply ``{"rpn.nms_thresh": 0.6, ...}``-style dotted overrides."""
    grouped: dict = {}
    for key, value in overrides.items():
        if "." in key:
            group, field = key.split(".", 1)
            grouped.setdefault(group, {})[field] = value
        else:
            grouped[key] = value
    updates = {}
    for group, fields in grouped.items():
        current = getattr(cfg, group)
        if isinstance(fields, dict) and dataclasses.is_dataclass(current):
            updates[group] = dataclasses.replace(current, **fields)
        else:
            updates[group] = fields
    return dataclasses.replace(cfg, **updates)
