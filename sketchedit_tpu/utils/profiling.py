"""Tracing / profiling helpers (SURVEY.md §5: the reference has none; its
closest artifact is wall-clock time_per_iter in iter_counter.py).

Two layers:
* `trace(logdir)` — wrap a region in a jax.profiler trace, viewable in
  TensorBoard/XProf (device timelines, HLO cost breakdown, HBM usage).
* `StageTimer` — coarse wall-clock stage timing with forced completion
  (fetches a scalar per stop so async dispatch can't lie), for quick
  production telemetry without a profiler UI.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sketchedit_trace"):
    """jax.profiler trace around a region; no-op if the backend refuses."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover
        print(f"profiler trace unavailable: {e}")
    try:
        yield logdir
    finally:
        if started:
            jax.profiler.stop_trace()


def force_done(tree):
    """Force device completion of a pytree by reducing one leaf to host."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        float(jnp.sum(leaves[-1].astype(jnp.float32)))
    return tree


class StageTimer:
    """Accumulates per-stage wall-clock across iterations.

    with timer.stage("netM"):
        out = netm(...)          # timer forces completion on exit
    print(timer.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._result = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "out" in holder:
                force_done(holder["out"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            mean_ms = self.totals[name] / max(1, self.counts[name]) * 1e3
            lines.append(f"{name:24s} {mean_ms:9.2f} ms/iter  "
                         f"x{self.counts[name]}")
        return "\n".join(lines)
