"""Observability: structured metric logging + profiling harness."""

from ldm_tf2_tpu.utils.logging import MetricLogger
from ldm_tf2_tpu.utils.profiling import Timer, trace

__all__ = ["MetricLogger", "Timer", "trace"]
