"""Profiling: step timing + jax.profiler trace capture.

The reference has wall-clock meters only (SURVEY.md §5); here a
`StepTimer` reproduces its step_time/data_time accounting and
`maybe_trace` wires `jax.profiler.trace` around a step range so TPU
runs can be inspected in XProf/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

from unimp_tpu.utils.logging import AverageMeter


class StepTimer:
    """step_time / data_time accounting (mmrec.py:99-105,259-264)."""

    def __init__(self):
        self.step_time = AverageMeter()
        self.data_time = AverageMeter()
        self._end = time.time()

    def data_loaded(self):
        self.data_time.update(time.time() - self._end)

    def step_done(self):
        self.step_time.update(time.time() - self._end)
        self._end = time.time()

    def throughput(self, samples_per_step: int, world_size: int = 1):
        if self.step_time.val == 0:
            return {}
        return {
            "step_time": self.step_time.avg,
            "data_time": self.data_time.avg,
            "samples_per_second": samples_per_step * world_size / self.step_time.val,
            "samples_per_second_per_chip": samples_per_step / self.step_time.val,
        }


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed step range."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
