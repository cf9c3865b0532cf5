"""Headline benchmark: land grid-cells per second per chip, daily step.

Measures the flagship configuration — global 0.5-degree packed land-cell
array (~67k cells), full coupled day step (48 hydrology substeps + daily
vegetation growth) in float32 — on one chip, and reports throughput in
land grid-cells/s/chip.

Baseline (BASELINE.md): the reference integrates ~62-67k land cells for
112 years in 114 min on 64 Sandy Bridge cores, i.e. ~450-500 grid-cell-
days/s per core at daily-step granularity.  ``vs_baseline`` is the ratio
of our per-chip rate to 500 cell-days/s (one reference core).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the day-step scan is a large XLA graph
# (~100 s cold compile on TPU); warm runs load in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CELLS_PER_S_PER_CORE = 500.0


def main() -> None:
    n_cells = 66560          # ~global 0.5-degree land-cell count, padded
    n_warmup = 3
    n_iters = 10

    from __graft_entry__ import _build
    step_fn, state, forcing, params, geom, cfg = _build(n_cells, "float32")

    # No donation: the axon backend cannot transfer outputs of
    # donated-input executables back to host.
    step = jax.jit(step_fn)

    # Warm-up: compile + stabilize clocks.
    for _ in range(n_warmup):
        state, res = step(state, forcing)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, res = step(state, forcing)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    max_res = float(jnp.max(res))
    if not np.isfinite(max_res) or max_res > 0.1:
        print(json.dumps({"metric": "land grid-cells/s/chip",
                          "value": 0.0, "unit": "cells/s",
                          "vs_baseline": 0.0,
                          "error": f"residual {max_res}"}))
        sys.exit(1)

    cells_per_s = n_cells * n_iters / elapsed
    result = {
        "metric": "land grid-cells/s/chip (0.5deg global, daily step)",
        "value": round(cells_per_s, 1),
        "unit": "grid-cell-days/s/chip",
        "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S_PER_CORE,
                             2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
