"""Evaluation + visualization (SURVEY.md C20, C22)."""

from tpudet.eval.metrics import (  # noqa: F401
    CocoStyleEvaluator,
    DetectionEvaluator,
    ProposalRecallEvaluator,
    average_precision,
)
from tpudet.eval.visualize import draw_detections  # noqa: F401
