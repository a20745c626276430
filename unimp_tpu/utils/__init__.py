"""Utilities: logging, timing meters, profiling."""

from unimp_tpu.utils.logging import AverageMeter, MetricLogger
from unimp_tpu.utils.profiling import StepTimer, maybe_trace

__all__ = ["AverageMeter", "MetricLogger", "StepTimer", "maybe_trace"]
