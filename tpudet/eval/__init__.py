"""Evaluation + visualization (SURVEY.md C20, C22)."""

from tpudet.eval.metrics import DetectionEvaluator, average_precision  # noqa: F401
from tpudet.eval.visualize import draw_detections  # noqa: F401
