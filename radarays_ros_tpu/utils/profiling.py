"""Tracing/profiling — the reference's ad-hoc StopWatch prints, structured.

The reference times frames with rmagine StopWatch and prints seconds/frame
(RadarCPU.cpp:147-148,550-553) and per-stage fractions (RadarGPU.cpp:262-267,
854). Here timing is a first-class utility:

  * `StageTimer` — named wall-clock stages with `block_until_ready` fencing
    (XLA is async; un-fenced timers measure dispatch, not compute) and a
    per-stage summary in the GPU engine's fraction format.
  * `trace_context` — wraps jax.profiler for on-TPU traces viewable in
    TensorBoard/XProf (`trace_dir` -> profile dump).
  * `annotate` — jax.profiler.TraceAnnotation pass-through so pipeline
    stages show up named in profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulating named wall-clock stages.

    with timer.stage("trace"):
        out = ...
        jax.block_until_ready(out)   # or pass fence=out
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def add(self, name: str, seconds: float):
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    @property
    def total(self) -> float:
        return sum(self.totals.values())

    def summary(self) -> str:
        """Per-stage fractions, the RadarGPU.cpp:854 print format."""
        tot = max(self.total, 1e-12)
        parts = [
            f"{k}: {v * 1e3:.2f}ms ({v / tot:.1%})"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return f"total {tot * 1e3:.2f}ms | " + ", ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str] = None):
    """jax.profiler trace capture (XProf/TensorBoard) when trace_dir given."""
    if trace_dir is None:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code paths for device profiles."""
    return jax.profiler.TraceAnnotation(name)
