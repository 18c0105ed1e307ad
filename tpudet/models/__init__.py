"""Model layer (reference L3 — SURVEY.md C5, C9, C13, C24): Flax linen
modules in NHWC layout (TPU conv-optimal), bf16-capable compute, params f32."""

from tpudet.models.resnet import ResNet, TinyBackbone, build_backbone  # noqa: F401
from tpudet.models.fpn import FPN, RetinaNetFPN  # noqa: F401
from tpudet.models.rpn_head import RPNHead  # noqa: F401
from tpudet.models.det_head import FastRCNNHead  # noqa: F401
from tpudet.models.faster_rcnn import FasterRCNN  # noqa: F401
from tpudet.models.mask_head import MaskHead  # noqa: F401
from tpudet.models.mask_rcnn import MaskRCNN  # noqa: F401
from tpudet.models.retinanet import RetinaNet  # noqa: F401
from tpudet.models.fcos import FCOS  # noqa: F401
from tpudet.models.cascade_rcnn import CascadeRCNN  # noqa: F401
from tpudet.models.keypoint_rcnn import KeypointRCNN  # noqa: F401
from tpudet.models.panoptic_fpn import PanopticFPN  # noqa: F401
from tpudet.models.detr import DETR  # noqa: F401
from tpudet.models.deformable_detr import DeformableDETR  # noqa: F401


def build_model(cfg):
    """Detector factory keyed on ``cfg.model`` — all families share the
    ``init`` / ``loss`` / ``predict`` surface and the batch/detection dict
    contracts, so every consumer (trainer, evaluator, serving exporter,
    CLIs) is model-agnostic through this one switch."""
    if cfg.model == "faster_rcnn":
        return FasterRCNN(cfg)
    if cfg.model == "mask_rcnn":
        return MaskRCNN(cfg)
    if cfg.model == "retinanet":
        return RetinaNet(cfg)
    if cfg.model == "fcos":
        return FCOS(cfg)
    if cfg.model == "cascade_rcnn":
        return CascadeRCNN(cfg)
    if cfg.model == "keypoint_rcnn":
        return KeypointRCNN(cfg)
    if cfg.model == "panoptic_fpn":
        return PanopticFPN(cfg)
    if cfg.model == "detr":
        return DETR(cfg)
    if cfg.model == "deformable_detr":
        return DeformableDETR(cfg)
    raise ValueError(
        f"unknown model {cfg.model!r}: expected 'faster_rcnn', 'mask_rcnn', "
        "'retinanet', 'fcos', 'cascade_rcnn', 'keypoint_rcnn', "
        "'panoptic_fpn', 'detr', or 'deformable_detr'"
    )
