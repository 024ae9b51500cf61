"""Per-phase wall timers + optional jax.profiler traces.

SURVEY.md §5 commits to profiler hooks; the reference has none (only
start/end wall prints, run.py:54-62,76-78). These timers are what turns a
"bench timed out" into an actionable per-phase table.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimers:
    """Accumulating named wall-clock timers.

    with timers("frontend"): ...      # accumulate
    timers.report() -> str table sorted by total time.
    """

    def __init__(self):
        self.total: dict[str, float] = {}
        self.count: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] = self.total.get(name, 0.0) + dt
            self.count[name] = self.count.get(name, 0) + 1

    def add(self, name: str, dt: float):
        self.total[name] = self.total.get(name, 0.0) + dt
        self.count[name] = self.count.get(name, 0) + 1

    def report(self) -> str:
        rows = sorted(self.total.items(), key=lambda kv: -kv[1])
        lines = [f"{'phase':<22}{'total_s':>10}{'calls':>8}{'mean_ms':>10}"]
        for name, tot in rows:
            n = self.count[name]
            lines.append(
                f"{name:<22}{tot:>10.2f}{n:>8}{1000.0 * tot / max(n, 1):>10.1f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: round(v, 4) for k, v in self.total.items()}


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace over a region when trace_dir is set
    (view with tensorboard / xprof)."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
