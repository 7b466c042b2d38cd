"""Tracing / profiling helpers (what the reference lacks, SURVEY.md 5.1).

The reference's observability is wall-clock prints around
``torch.cuda.synchronize()`` (reference train.py:169-199).  Here:

* ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device + host activity.
* ``StepTimer``: rolling per-step host timing with percentile summaries.
* ``annotate``: named trace spans (shows up in the profiler timeline).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock stats for the train loop."""

    def __init__(self, window: int = 200):
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self) -> float:
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> str:
        if not self.times:
            return 'no steps timed'
        a = np.asarray(self.times)
        return ('steps=%d mean=%.3fs p50=%.3fs p90=%.3fs p99=%.3fs'
                % (len(a), a.mean(), np.percentile(a, 50),
                   np.percentile(a, 90), np.percentile(a, 99)))
