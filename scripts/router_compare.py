"""Routing-scheme cost/fidelity comparison (VERDICT r4 item 5).

`Config.routing_scheme` has shipped as "linear" — a daily linear
reservoir that moves water at most one cell per day, which the module's
own docstring flags as too slow for continental travel times at
0.5 degrees (physics/routing.py).  The kinematic-wave and
variable-parameter Muskingum-Cunge routers move water at physical
celerity.  This probe measures what promoting one of them to default
actually costs: flagship day-step time under each scheme on the real
land grid, plus a short invariant-checked soak per scheme.

Usage: python scripts/router_compare.py [--iters 50] [--soak-years 3]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from hybrid9_tpu.config import Config  # noqa: E402
from hybrid9_tpu.data.soil import load_soil  # noqa: E402
from hybrid9_tpu.data.synthetic import synthetic_forcing_day  # noqa: E402
from hybrid9_tpu.run import Simulation  # noqa: E402
from hybrid9_tpu.state import Forcing  # noqa: E402
from hybrid9_tpu.step import day_step  # noqa: E402

SCHEMES = ("linear", "kinematic", "muskingum")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--soak-years", type=int, default=3)
    args = ap.parse_args()

    base_cfg = Config()
    grid, params = load_soil(base_cfg)
    n = grid.n_padded
    day = synthetic_forcing_day(n, 180, seed=1, lat=grid.cell_lat)
    rows = []
    for scheme in SCHEMES:
        cfg = Config(**{**base_cfg.__dict__, "routing_scheme": scheme})
        sim = Simulation(cfg, params, land_grid=grid)
        kw = sim.step_kwargs()
        forcing = Forcing(**{k: jnp.asarray(v, sim.dtype)
                             for k, v in day.items()})
        step = jax.jit(lambda s, f, kw=kw, sim=sim, cfg=cfg: day_step(
            s, f, sim.params, sim.geom, cfg.dt, cfg.nisurf, **kw))
        state = sim.state
        for _ in range(3):
            state, diags = step(state, forcing)
        float(jnp.sum(state.river_store))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, diags = step(state, forcing)
        checksum = float(jnp.sum(state.river_store))
        dtd = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(checksum)
        rows.append((scheme, dtd))
        print(f"{scheme:10s}: {dtd*1e3:7.2f} ms/day "
              f"({n/dtd/1e6:6.2f} M cells/s) "
              f"river_store sum {checksum:.4g} mm", flush=True)

    base = rows[0][1]
    for scheme, dtd in rows[1:]:
        print(f"{scheme:10s}: {(dtd-base)*1e3:+6.2f} ms vs linear "
              f"({100*(dtd-base)/base:+5.1f} %)")

    # Short invariant soak per scheme (the 10-year premium soak lives
    # in PERFORMANCE.md; this is the quick regression check).
    for scheme in SCHEMES:
        cfg = Config(start_year=1901, end_year=1900 + args.soak_years,
                     routing_scheme=scheme,
                     forcing="device-synthetic", write_annual=False)
        g2, p2 = load_soil(cfg)
        from hybrid9_tpu.data.device_forcing import (
            DeviceSyntheticForcingProvider)
        provider = DeviceSyntheticForcingProvider(
            g2.n_padded, seed=0, lat=g2.cell_lat)
        sim = Simulation(cfg, p2, land_grid=g2)
        t0 = time.perf_counter()
        worst = 0.0
        for year in range(cfg.start_year, cfg.end_year + 1):
            means = sim.run_year(year, provider)
            worst = max(worst, float(np.max(
                np.asarray(means["max_abs_residual"])[:g2.n_land])))
        river = np.asarray(sim.state.river_store)[:g2.n_land]
        dis = np.asarray(means["discharge"])[:g2.n_land]
        # Stores may carry transient micro-negative "reclaim debits"
        # (< ~3e-3 mm observed): the day's local runoff is NEGATIVE on
        # drainage-fixup days — the reference's own semantics
        # (HYDROLOGY.f90:1204-1211 takes unmet soil deficits back out
        # of drainage) — and the router debits the store to conserve.
        ok = (worst < 0.1 and np.all(np.isfinite(river))
              and np.all(river >= -1e-2) and np.all(np.isfinite(dis)))
        print(f"soak {scheme:10s}: {args.soak_years} yr in "
              f"{time.perf_counter()-t0:.0f}s, max|res| {worst:.3g} mm, "
              f"mean discharge {np.mean(dis):.3g} mm/day "
              f"{'CLEAN' if ok else 'VIOLATION'}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
