"""Tracing / profiling instrumentation.

The reference's observability is ad-hoc `std::chrono` spans with
commented-out prints (`Tracking.cc:270-274,452-456,536-545`) plus a
per-frame wall-time print in the example mains. Here: a structured
per-stage span recorder (host timers around device stages with
block-until-ready fencing) and an optional XLA profiler trace context
for TensorBoard-level kernel analysis.

Usage:
    prof = StageProfiler()
    with prof.span("track.motion"):
        res = jitted_stage(...)
        jax.block_until_ready(res)
    ...
    print(prof.report())

    with xla_trace("/tmp/trace"):    # opens a jax.profiler trace
        run_frames()
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class StageProfiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def stats(self):
        import numpy as np
        out = {}
        for k, v in self.samples.items():
            a = np.asarray(v) * 1e3
            out[k] = {
                "n": len(v),
                "mean_ms": float(a.mean()),
                "median_ms": float(np.median(a)),
                "p90_ms": float(np.percentile(a, 90)),
                "total_ms": float(a.sum()),
            }
        return out

    def report(self) -> str:
        rows = sorted(self.stats().items(),
                      key=lambda kv: -kv[1]["total_ms"])
        lines = [f"{'stage':<28}{'n':>6}{'median':>10}{'p90':>10}{'total':>12}"]
        for k, s in rows:
            lines.append(f"{k:<28}{s['n']:>6}{s['median_ms']:>9.2f}ms"
                         f"{s['p90_ms']:>9.2f}ms{s['total_ms']:>10.1f}ms")
        return "\n".join(lines)

    def dump_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.stats(), f, indent=2)

    def reset(self):
        self.samples.clear()


@contextlib.contextmanager
def xla_trace(logdir: str):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
