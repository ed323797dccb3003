"""Utilities: timing, metrics, profiling hooks."""

from csgn_tpu.utils.timing import Timer
from csgn_tpu.utils.metrics import OpMetrics, op_metrics

__all__ = ["Timer", "OpMetrics", "op_metrics"]
