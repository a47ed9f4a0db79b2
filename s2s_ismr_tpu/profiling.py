"""Tracing & throughput observability.

The reference's only instrumentation is a wall-clock print around main()
(tune_ECMWF_com.py:188-194) and per-trial val-loss prints
(training.py:107). Here profiling is a first-class, zero-cost-when-off
subsystem (SURVEY.md section 5): an XLA/TPU profiler trace context around
any pipeline stage, and a steps/sec counter whose numbers are the
BASELINE.md primary metric.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str], log=print):
    """jax.profiler trace context; no-op when trace_dir is None/empty.

    The trace is viewable in TensorBoard / Perfetto (plugin 'profile');
    it records XLA ops, fusion boundaries and TPU step time.

    log: where the serialization-cost notice lands — pipelines pass their
    injected stage logger so the message stays in-stream with stage logs
    instead of interleaving on raw stdout.
    """
    if not trace_dir:
        yield
        return
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    t_stop = None
    try:
        with jax.profiler.trace(trace_dir):
            try:
                yield
            finally:
                t_stop = time.perf_counter()
    finally:
        # Trace serialization happens on profiler-context exit and is NOT
        # free: a production NN stage's trace (~15M thunk events) took
        # ~16 min to dump on this 1-core host — far longer than the stage
        # it measured (PERF.md round 3). Surface it so a profiled run's
        # wall clock is explainable.
        if t_stop is not None:
            dump_s = time.perf_counter() - t_stop
            if dump_s > 1.0:
                log(f"[trace] serialized profile to {trace_dir} "
                    f"in {dump_s:.1f}s (excluded from stage timers)")


@dataclass
class StageTimer:
    """Wall-clock per pipeline stage + derived steps/sec, JSON-seriable."""
    stages: Dict[str, float] = dfield(default_factory=dict)
    counters: Dict[str, float] = dfield(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    def count(self, name: str, value: float):
        self.counters[name] = self.counters.get(name, 0.0) + value

    def steps_per_sec(self, steps_counter="train_steps", stage="nn"):
        s = self.counters.get(steps_counter, 0.0)
        t = self.stages.get(stage, 0.0)
        return s / t if t > 0 else float("nan")

    def summary(self) -> dict:
        out = {"stages_s": {k: round(v, 3) for k, v in self.stages.items()},
               "counters": dict(self.counters)}
        if "train_steps" in self.counters and "nn" in self.stages:
            out["train_steps_per_sec"] = round(self.steps_per_sec(), 1)
        return out

    def dump(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            json.dump(self.summary(), fh, indent=1)
        return path
