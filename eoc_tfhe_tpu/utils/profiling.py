"""Per-op timing and structured counters.

Replaces the reference wrapper's ``clock_t`` wall-clock prints
(``eoc-tfhe-run.cpp:239-240`` and 15 sibling sites — SURVEY.md §5) with a
structured, opt-in collector: per-op wall time, call counts, and derived
throughput (gates/s). ``jax.profiler`` traces can be layered on top via
:func:`trace` for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field

logger = logging.getLogger("eoc_tfhe_tpu")


@dataclass
class OpStats:
    calls: int = 0
    total_s: float = 0.0
    last_s: float = 0.0

    def as_dict(self) -> dict:
        return {"calls": self.calls, "total_s": self.total_s, "last_s": self.last_s}


class Profiler:
    """Process-wide op profiler. Enabled by default (cheap); JSON-dumpable."""

    def __init__(self) -> None:
        self.stats: dict[str, OpStats] = defaultdict(OpStats)
        self.enabled = True
        self.echo = False  # print per-op lines like the reference wrapper

    @contextlib.contextmanager
    def op(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s.calls += 1
            s.total_s += dt
            s.last_s = dt
            if self.echo:
                # Reference UX parity: "<op> completed in X ms"
                print(f"{name} completed in {dt * 1e3:.1f} ms")

    def summary(self) -> dict:
        return {k: v.as_dict() for k, v in sorted(self.stats.items())}

    def dump_json(self) -> str:
        return json.dumps(self.summary())

    def reset(self) -> None:
        self.stats.clear()


PROFILER = Profiler()


def op_timer(name: str):
    return PROFILER.op(name)


@contextlib.contextmanager
def trace(name: str, tensorboard_dir: str | None = None):
    """Optional jax.profiler trace around a region."""
    import jax

    if tensorboard_dir is None:
        with jax.profiler.TraceAnnotation(name):
            yield
    else:
        jax.profiler.start_trace(tensorboard_dir)
        try:
            with jax.profiler.TraceAnnotation(name):
                yield
        finally:
            jax.profiler.stop_trace()
