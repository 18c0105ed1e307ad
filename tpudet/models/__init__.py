"""Model layer (reference L3 — SURVEY.md C5, C9, C13, C24): Flax linen
modules in NHWC layout (TPU conv-optimal), bf16-capable compute, params f32."""

from tpudet.models.resnet import ResNet, TinyBackbone, build_backbone  # noqa: F401
from tpudet.models.fpn import FPN  # noqa: F401
from tpudet.models.rpn_head import RPNHead  # noqa: F401
from tpudet.models.det_head import FastRCNNHead  # noqa: F401
from tpudet.models.faster_rcnn import FasterRCNN  # noqa: F401
