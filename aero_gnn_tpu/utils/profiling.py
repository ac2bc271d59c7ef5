"""Profiling & throughput instrumentation.

The reference's only instrumentation is a one-shot CUDA memory printout
around the edge block (/root/reference/models/mgnLayer.py:186-203). Here:

  * ``trace(logdir)``      — jax.profiler trace context (Perfetto/TensorBoard)
  * ``Throughput``         — per-step edges/s, nodes/s, steps/s counters
  * ``device_memory_stats``— live HBM usage per device where supported
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/profile'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Rolling throughput meter for the train loop.

    >>> meter = Throughput(edges_per_step=E, nodes_per_step=N)
    >>> for batch in loader: step(...); meter.tick()
    >>> meter.summary()  # {'steps_per_s': ..., 'edges_per_s': ...}
    """

    def __init__(self, *, edges_per_step: int = 0, nodes_per_step: int = 0,
                 window: int = 50):
        self.edges_per_step = edges_per_step
        self.nodes_per_step = nodes_per_step
        self.window = window
        self._times = []
        self.total_steps = 0

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        self.total_steps += 1
        if len(self._times) > self.window:
            self._times.pop(0)

    def summary(self) -> Dict[str, float]:
        if len(self._times) < 2:
            return {"steps_per_s": 0.0, "edges_per_s": 0.0, "nodes_per_s": 0.0}
        dt = (self._times[-1] - self._times[0]) / (len(self._times) - 1)
        return {
            "steps_per_s": 1.0 / dt,
            "edges_per_s": self.edges_per_step / dt,
            "nodes_per_s": self.nodes_per_step / dt,
        }


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Per-device memory stats (bytes); None when the backend lacks them."""
    device = device or jax.devices()[0]
    try:
        return device.memory_stats()
    except Exception:  # noqa: BLE001 — platform-dependent availability
        return None
