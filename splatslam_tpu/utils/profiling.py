"""Per-phase wall timers + optional jax.profiler traces.

SURVEY.md §5 commits to profiler hooks; the reference has none (only
start/end wall prints, run.py:54-62,76-78). These timers are what turns a
"bench timed out" into an actionable per-phase table.
"""

from __future__ import annotations

import contextlib
import time


def _device_barrier():
    """Block until every dispatched computation has finished.

    Device executions are serialized in dispatch order, so fetching a
    fresh trivial computation drains the queue. Costs one link RTT."""
    import jax
    import numpy as _np
    _np.asarray(jax.numpy.zeros(()) + 1.0)


class PhaseTimers:
    """Accumulating named wall-clock timers.

    with timers("frontend"): ...      # accumulate
    timers.report() -> str table sorted by total time.

    SPLATSLAM_SYNC_TIMERS=1 inserts a device barrier at phase entry AND
    exit so each phase's time is its OWN device work — async dispatch
    otherwise attributes queued work to whichever later phase fetches
    first. Adds an RTT per boundary; diagnosis only, never production.
    """

    def __init__(self):
        self.total: dict[str, float] = {}
        self.count: dict[str, int] = {}
        import os
        self.sync = bool(os.environ.get("SPLATSLAM_SYNC_TIMERS"))

    @contextlib.contextmanager
    def __call__(self, name: str):
        if self.sync:
            _device_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                _device_barrier()
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
