"""Stats / profiling surface.

Reference: /root/reference/src/core/stats.{h,cpp} — STAT_* macros with
thread-local counters merged via ``MergeWorkerThreadStats`` and printed
grouped by "Category/Title" (StatsAccumulator::Print, stats.cpp:105-187);
the SIGPROF sampling profiler (stats.cpp:204-233).

TPU-first design: counters are plain entries in the metrics dicts that jitted
steps *return* (reduce across devices with psum where sharded) — no
thread-local state, no signal handlers.  This module provides the
accumulate/format layer and named-phase tracing via jax.profiler annotations
(the ProfilePhase analog).
"""

from __future__ import annotations

import contextlib
from collections import defaultdict
from typing import Dict

import jax


class StatsAccumulator:
    """Accumulate "Category/Title" -> value counters across iterations
    (StatsAccumulator, stats.cpp:105-187)."""

    def __init__(self) -> None:
        self._counters: Dict[str, float] = defaultdict(float)

    def add(self, metrics: Dict[str, object], prefix: str = "") -> None:
        for k, v in metrics.items():
            if isinstance(v, dict):
                self.add(v, prefix=f"{prefix}{k}/")
            else:
                try:
                    self._counters[prefix + k] += float(v)
                except (TypeError, ValueError):
                    pass

    def report(self) -> str:
        """Grouped category report (the pbrt stats block format)."""
        groups: Dict[str, Dict[str, float]] = defaultdict(dict)
        for key, val in sorted(self._counters.items()):
            cat, _, title = key.rpartition("/")
            groups[cat or "General"][title or key] = val
        lines = ["Statistics:"]
        for cat in sorted(groups):
            lines.append(f"  {cat}")
            for title, val in sorted(groups[cat].items()):
                if val == int(val):
                    lines.append(f"    {title:<42}{int(val):>16,d}")
                else:
                    lines.append(f"    {title:<42}{val:>16.3f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self._counters)


@contextlib.contextmanager
def profile_phase(name: str):
    """Named trace region (ProfilePhase analog, stats.h:138-189): shows up in
    jax.profiler / xprof traces as an annotation."""
    with jax.profiler.TraceAnnotation(name):
        yield


def trace_to(log_dir: str):
    """Start a jax.profiler trace (the reference's SIGPROF profiler analog;
    view with tensorboard/xprof)."""
    return jax.profiler.trace(log_dir)
