"""Tracing / profiling helpers (SURVEY §5 aux subsystems).

The reference labels every phase with torch profiler scopes + CUDA events
(training_loop.py:280-285,507-512). TPU equivalents:
  * `phase_timer` — wall-clock phase timing around `block_until_ready`
  * `trace` — context manager over `jax.profiler` for xprof traces
  * `annotate` — `jax.named_scope`, visible in the trace viewer
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates per-phase wall times; `maintenance_time` analogue of the
    reference's tick bookkeeping."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.named_scope
