"""Profiling / observability utilities.

Reference has only ad-hoc timing (SURVEY.md §5): IterTimerHook, dist_test
middle-third latency, a thop-based flops counter. TPU-native equivalents:
jax.profiler traces (viewable in TensorBoard/Perfetto), a step timer with
data/compute split, and FLOP estimates from XLA's own cost analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('runs/prof'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_device_ms_by_source(trace_dir: str) -> Dict[str, float]:
    """Parse the newest .trace.json.gz under `trace_dir` and sum device-lane
    op durations (ms) by the op's `source` metadata (file:line). The
    per-section ledger every perf round plans from (PLAN.md cost models);
    bench.py emits its top entries with each run so device-time claims are
    auditable round-over-round."""
    import glob
    import gzip
    import json
    import os
    from collections import defaultdict

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return {}
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_src: Dict[str, float] = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "tpu" not in pid_names.get(e["pid"], "").lower():
            continue
        if "XLA Op" not in tid_names.get((e["pid"], e.get("tid")), ""):
            continue
        src = e.get("args", {}).get("source", "?")
        by_src[src] += e.get("dur", 0) / 1e3               # us -> ms
    return dict(by_src)


def flops_of(fn: Callable, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of a jitted callable from XLA cost analysis
    (replacement for det3d/utils/flops_counter.py)."""
    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


class IterTimer:
    """Running data/step time means, IterTimerHook-style."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._n = 0
        self.data_time = 0.0
        self.step_time = 0.0
        self._t = time.perf_counter()

    def tic_data(self):
        self._t_data = time.perf_counter()

    def toc_data(self):
        self._dt_data = time.perf_counter() - self._t_data

    def toc_step(self):
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            k = self._n - self.warmup
            self.data_time += (self._dt_data - self.data_time) / k
            self.step_time += (dt - self.step_time) / k
        self._t = time.perf_counter()

    def summary(self) -> Dict[str, float]:
        return {"data_time": self.data_time, "step_time": self.step_time}
