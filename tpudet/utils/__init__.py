"""Utilities: metrics logging, profiling helpers (SURVEY.md C21, §5)."""

from tpudet.utils.logging import MetricsLogger  # noqa: F401
