"""Component cost breakdown of the flagship day step (r4).

The flagship (production-default) day runs ~20 % slower than the
reference-scope kernel (PERFORMANCE.md flagship table).  This probe
attributes that cost: it times the full default day step, then a
sequence of variants each with ONE subsystem disabled, on the real
land grid — the per-component cost is the delta.

Usage: python scripts/flagship_breakdown.py [--iters 50]
Prints one line per variant.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                                 # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp                                    # noqa: E402

from hybrid9_tpu.config import Config                      # noqa: E402
from hybrid9_tpu.data.soil import load_soil                # noqa: E402
from hybrid9_tpu.data.synthetic import (                   # noqa: E402
    synthetic_forcing_day)
from hybrid9_tpu.run import Simulation                     # noqa: E402
from hybrid9_tpu.state import Forcing                      # noqa: E402
from hybrid9_tpu.step import day_step                      # noqa: E402

VARIANTS = [
    ("flagship (all on)", {}),
    ("- carbon", dict(carbon=False)),
    ("- routing", dict(lateral_routing=False)),
    ("- soil ice (ramp proxy)", dict(soil_ice=False)),
    ("- freeze entirely", dict(frozen_soil=False, soil_ice=False)),
    ("- snow + albedo", dict(snow=False, snow_albedo=False)),
    ("- all daily extras (reference scope)",
     dict(carbon=False, lateral_routing=False, soil_ice=False,
          frozen_soil=False, snow=False, snow_albedo=False)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    print("loading soil/grid...", flush=True)
    base_cfg = Config()
    grid, params = load_soil(base_cfg)
    n = grid.n_padded
    day = synthetic_forcing_day(n, 180, seed=1, lat=grid.cell_lat)
    results = []
    for label, overrides in VARIANTS:
        print(f"[{label}] building Simulation...", flush=True)
        t_b = time.perf_counter()
        cfg = Config(**{**base_cfg.__dict__, **overrides})
        sim = Simulation(cfg, params, land_grid=grid)
        print(f"[{label}] built in {time.perf_counter()-t_b:.1f}s; "
              "compiling...", flush=True)
        kw = sim.step_kwargs()
        dtype = sim.dtype
        forcing = Forcing(**{k: jnp.asarray(v, dtype)
                             for k, v in day.items()})
        step = jax.jit(lambda s, f, kw=kw, sim=sim, cfg=cfg: day_step(
            s, f, sim.params, sim.geom, cfg.dt, cfg.nisurf, **kw))
        state = sim.state
        for _ in range(3):
            state, diags = step(state, forcing)
        float(jnp.sum(state.soil.h2osoi_liq))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, diags = step(state, forcing)
        checksum = float(jnp.sum(state.soil.h2osoi_liq))
        dtd = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(checksum)
        results.append((label, dtd))
        print(f"{label:40s}: {dtd * 1e3:7.2f} ms/day  "
              f"({n / dtd / 1e6:6.2f} M cells/s)", flush=True)
    base = results[0][1]
    print("\ndeltas vs flagship:")
    for label, dtd in results[1:]:
        print(f"{label:40s}: {(base - dtd) * 1e3:+7.2f} ms "
              f"({100 * (base - dtd) / base:+5.1f} %)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
