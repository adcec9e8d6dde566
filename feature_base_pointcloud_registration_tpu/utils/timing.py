"""Timing + profiling harness.

The reference's entire observability stack is a chrono stopwatch around the
GN solve (TicToc, ref: src/tic_toc.hpp:15-33 used at src/mapOptmization.h:
315-318).  TicToc is reproduced for parity; StageTimer adds the TPU-correct
version (block_until_ready around async dispatch) and trace_profile wraps
jax.profiler for real traces (SURVEY.md §5 tracing note).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class TicToc:
    """chrono stopwatch; toc() returns elapsed milliseconds (ref parity)."""

    def __init__(self):
        self.tic()

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        return (time.perf_counter() - self._start) * 1000.0


class StageTimer:
    """Per-stage wall-time accumulator that understands async dispatch.

    Usage:
        st = StageTimer()
        with st.stage("register"):
            out = register_scan(...)
        st.block(out)      # or pass result into stage(..., block=out)
        print(st.summary())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def block(self, tree):
        jax.block_until_ready(tree)

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:>24}: {t*1000:9.2f} ms total"
                         f"  {t/n*1000:8.3f} ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_profile(log_dir: str = "/tmp/fbpr_trace"):
    """jax.profiler trace around a block (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
