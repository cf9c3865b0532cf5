"""Phase timers and JAX profiler integration.

Replaces the reference's CPU_TIME bookkeeping (INIT.f90:50;
HYBRID9.f90:572-573; CONTROL.f90:63-66) with named phase timers, and
wraps ``jax.profiler`` tracing for kernel-level inspection.

Timing on this TPU backend requires a forced device-to-host transfer to
drain the dispatch queue (``block_until_ready`` alone returns early);
``device_sync`` does that.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp

from .logging import get_logger

log = get_logger(__name__)


def device_sync(pytree) -> float:
    """Drain the device queue by transferring a scalar reduction."""
    leaf = jax.tree_util.tree_leaves(pytree)[0]
    return float(jnp.sum(leaf))


class PhaseTimers:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                device_sync(sync_on)
            dtime = time.perf_counter() - t0
            self.totals[name] += dtime
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get,
                           reverse=True):
            lines.append(f"{name:24s} {self.totals[name]:10.3f}s "
                         f"x{self.counts[name]}")
        return "\n".join(lines)

    def log_report(self) -> None:
        for line in self.report().splitlines():
            log.info("timer: %s", line)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/h9tpu_trace"):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)
