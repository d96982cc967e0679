"""First-class tracing / stage timing.

The reference only has ad-hoc time.time() probes inside its VLAD kernel
(func_vpr.py:1185,1206-1208); here, per-stage wall-clock accounting and
jax.profiler trace capture are framework features.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; prints a summary table.

    Measures HOST-observed wall time only: it does NOT block on async
    dispatch — callers timing device work must force a sync (readback /
    block_until_ready) inside the stage, or the stage records dispatch
    time, not compute time.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{'stage':<40} {'total_s':>10} {'count':>8} {'mean_ms':>10}"]
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(
                f"{name:<40} {s['total_s']:>10.3f} {s['count']:>8d} "
                f"{1e3 * s['mean_s']:>10.3f}")
        return "\n".join(lines)

    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


_GLOBAL_TIMER = StageTimer()


def stage_timer() -> StageTimer:
    """Process-global stage timer."""
    return _GLOBAL_TIMER


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace when log_dir is set; no-op otherwise."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
