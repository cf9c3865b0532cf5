"""Headline benchmark: land grid-cells per second per chip, daily step.

Measures the flagship configuration — global 0.5-degree packed land-cell
array (~67k cells), full coupled day step (48 hydrology substeps + daily
vegetation growth) in float32 — on one chip, and reports throughput in
land grid-cells/s/chip.  The hydrology day runs as the VMEM-resident
Pallas kernel (physics/pallas_day.py); set H9_BENCH_PALLAS=0 to measure
the XLA scan path instead.

Baseline (BASELINE.md): the reference integrates ~62-67k land cells for
112 years in 114 min on 64 Sandy Bridge cores, i.e. ~450-500 grid-cell-
days/s per core at daily-step granularity.  ``vs_baseline`` is the ratio
of our per-chip rate to 500 cell-days/s (one reference core).

Timing note: the loop is closed with a device-to-host checksum INSIDE the
timed window — on this TPU backend ``block_until_ready`` alone does not
drain the dispatch queue, so timings without a forced transfer are
meaningless.

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

# Persistent compilation cache: the day-step graphs are large (~2-10 min
# cold compile on TPU); warm runs load in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CELLS_PER_S_PER_CORE = 500.0


def _bench_flagship(n_warmup: int = 3, n_iters: int = 50) -> dict:
    """Measure the FULL production-default day step (VERDICT r3 item 2).

    ``Config()`` defaults: degree-day snowpack + snow-albedo feedback +
    prognostic soil ice/temperature + frozen-soil impedance + carbon
    cascade + kinematic-wave lateral routing (dense roll form,
    routing_form="auto") + zd09_every=8, on the
    real 0.5-degree land grid (load_soil; n_padded cells), assembled by
    ``run.Simulation.step_kwargs()`` — exactly the physics a default
    `run` dispatches per day (the reference day loop this mirrors:
    HYBRID9.f90:193-217).  Quantifies what the daily XLA side (snow/
    thermal/carbon/routing around the hydrology kernel) costs on top of
    the reference-scope line.
    """
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.data.synthetic import synthetic_forcing_day
    from hybrid9_tpu.run import Simulation
    from hybrid9_tpu.state import Forcing
    from hybrid9_tpu.step import day_step

    cfg = Config()
    grid, params = load_soil(cfg)
    sim = Simulation(cfg, params, land_grid=grid)
    kw = sim.step_kwargs()
    n_cells = sim.n
    day = synthetic_forcing_day(n_cells, 180, seed=1, lat=grid.cell_lat)
    dtype = sim.dtype
    forcing = Forcing(**{k: jnp.asarray(v, dtype)
                         for k, v in day.items()})

    step = jax.jit(lambda s, f: day_step(s, f, sim.params, sim.geom,
                                         cfg.dt, cfg.nisurf, **kw))
    state = sim.state
    for _ in range(n_warmup):
        state, diags = step(state, forcing)
    float(jnp.sum(state.soil.h2osoi_liq))       # D2H queue drain

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, diags = step(state, forcing)
    checksum = float(jnp.sum(state.soil.h2osoi_liq))
    elapsed = time.perf_counter() - t0

    max_res = float(jnp.max(diags["max_abs_residual"]))
    out = {
        "value": round(n_cells * n_iters / elapsed, 1),
        "unit": "grid-cell-days/s/chip",
        "n_cells": n_cells,
        "config": "production defaults (snow+albedo+ice+thermal+carbon"
                  "+kinematic routing, zd09=8)",
        "pallas": bool(sim.use_pallas),
        "vs_baseline": round(n_cells * n_iters / elapsed
                             / BASELINE_CELLS_PER_S_PER_CORE, 2),
    }
    if not (np.isfinite(checksum) and np.isfinite(max_res)
            and max_res <= 0.1):
        out["error"] = f"residual {max_res}"
        out["value"] = 0.0
    return out


def main() -> None:
    # H9_BENCH_N overrides the cell count; 282624 = padded global
    # 0.25-degree land-cell count (the resolution-scaling second line in
    # PERFORMANCE.md).  Default = padded global 0.5-degree count.
    n_cells = int(os.environ.get("H9_BENCH_N", "66560"))
    n_warmup = 3
    n_iters = 100
    use_pallas = os.environ.get("H9_BENCH_PALLAS", "1") != "0"
    # H9_BENCH_SHARD=1: run the sharded production path (shard_map'd
    # Pallas kernel over a mesh of all local devices) — must match the
    # unsharded number on one chip (VERDICT round-1 item 1).
    shard = os.environ.get("H9_BENCH_SHARD", "0") != "0"

    from __graft_entry__ import _build
    from hybrid9_tpu.step import day_step
    step_fn, state, forcing, params, geom, cfg = _build(n_cells)
    # H9_BENCH_ZD09=k overrides the ZD09 refresh interval; default is
    # the production Config default (8 = 4-hourly refresh; 1 = exact
    # reference behavior, the mode all parity tests use).
    zd09_every = int(os.environ.get("H9_BENCH_ZD09", str(cfg.zd09_every)))

    mesh = None
    per_device = n_cells
    if shard:
        from hybrid9_tpu.parallel.sharding import CellSharding
        cs = CellSharding.create()
        cs.check_divisible(n_cells)
        state = cs.put(state)
        forcing = cs.put(forcing)
        params = cs.put(params)
        mesh = cs.mesh
        per_device = n_cells // cs.n_devices

    # Largest VMEM tile that divides the per-device cell count (the
    # sharded kernel runs on local shards, so 1024 only works when
    # per_device is a multiple of it).
    pallas_block = next(b for b in (1024, 512, 256, 128, per_device)
                        if per_device % b == 0)

    step = jax.jit(
        lambda s, f: day_step(s, f, params, geom, cfg.dt, cfg.nisurf,
                              use_pallas=use_pallas,
                              pallas_block=pallas_block,
                              mesh=mesh if use_pallas else None,
                              zd09_every=zd09_every))

    def sync(st):
        # Forced D2H transfer: the only reliable queue drain here.
        return float(jnp.sum(st.soil.h2osoi_liq))

    for _ in range(n_warmup):
        state, diags = step(state, forcing)
    sync(state)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, diags = step(state, forcing)
    checksum = sync(state)
    elapsed = time.perf_counter() - t0

    max_res = float(jnp.max(diags["max_abs_residual"]))
    if not (np.isfinite(checksum) and np.isfinite(max_res)
            and max_res <= 0.1):
        print(json.dumps({"metric": "land grid-cells/s/chip",
                          "value": 0.0, "unit": "cells/s",
                          "vs_baseline": 0.0,
                          "error": f"residual {max_res}"}))
        sys.exit(1)

    cells_per_s = n_cells * n_iters / elapsed
    label = "0.5deg global" if n_cells == 66560 else (
        "0.25deg global" if n_cells == 282624 else f"{n_cells} cells")
    result = {
        "metric": f"land grid-cells/s/chip ({label}, daily step)",
        "value": round(cells_per_s, 1),
        "unit": "grid-cell-days/s/chip",
        "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S_PER_CORE,
                             2),
        "n_cells": n_cells,
        # Mode flags, so BENCH_r*.json comparisons across rounds cannot
        # silently mix modes: zd09_every=1 is exact-reference behavior,
        # 8 is the documented production approximation (DEVIATIONS.md).
        "zd09_every": zd09_every,
        "pallas": use_pallas,
        "sharded": shard,
    }
    # Flagship line (VERDICT r3 item 2): the FULL production-default day
    # step measured alongside the reference-scope number, nested so the
    # driver's one-JSON-line record carries both.  H9_BENCH_FLAGSHIP=0
    # skips it (e.g. for quick mode sweeps).
    if os.environ.get("H9_BENCH_FLAGSHIP", "1") != "0" and not shard:
        try:
            result["flagship"] = _bench_flagship()
        except Exception as e:          # keep the headline line alive
            result["flagship"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
