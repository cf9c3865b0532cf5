"""Multi-year soak of the FULL production-default configuration.

The round-4 zd09 study ran reference-scope physics; this soak runs the
flagship defaults — degree-day snow + snow-albedo feedback + prognostic
soil ice/temperature + frozen-soil impedance + carbon cascade +
linear-reservoir routing, zd09_every=8, Pallas path on TPU — for N
years of on-device synthetic forcing, watching the health invariants:
finite state everywhere, water-balance residual < 0.1 mm, and bounded
prognostics (SWE under the cap, zwt in [0, 80], carbon pools >= 0).

Usage: python scripts/flagship_soak.py [--years 20]
Exit 0 iff every year is clean.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=20)
    ap.add_argument("--resolution", type=float, default=0.5)
    ap.add_argument("--snow-scheme", default="degree-day",
                    choices=("degree-day", "twolayer"))
    ap.add_argument("--routing-scheme", default="kinematic",
                    choices=("linear", "kinematic", "muskingum"),
                    help="default follows Config (kinematic since r5)")
    args = ap.parse_args()

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.device_forcing import (
        DeviceSyntheticForcingProvider)
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    cfg = Config(start_year=1901, end_year=1900 + args.years,
                 resolution_deg=args.resolution,
                 snow_scheme=args.snow_scheme,
                 routing_scheme=args.routing_scheme,
                 forcing="device-synthetic", write_annual=False)
    grid, params = load_soil(cfg)
    provider = DeviceSyntheticForcingProvider(
        grid.n_padded, seed=0, lat=grid.cell_lat)
    sim = Simulation(cfg, params, land_grid=grid)
    nl = grid.n_land
    ok = True
    t0 = time.perf_counter()
    for year in range(cfg.start_year, cfg.end_year + 1):
        means = sim.run_year(year, provider)
        res = float(np.max(np.asarray(means["max_abs_residual"])[:nl]))
        st = sim.state
        checks = {
            "zwt": np.asarray(st.soil.zwt)[:nl],
            "wa": np.asarray(st.soil.wa)[:nl],
            "h2osoi": np.asarray(st.soil.h2osoi_liq)[:nl],
            "swe": np.asarray(st.swe)[:nl],
            "ice": np.asarray(st.h2osoi_ice)[:nl],
            "c_slow": np.asarray(st.carbon.c_soil_slow)[:nl],
            "river": np.asarray(st.river_store)[:nl],
        }
        bad = {k: int(np.sum(~np.isfinite(v)))
               for k, v in checks.items() if np.sum(~np.isfinite(v))}
        viol = []
        if res >= 0.1:
            viol.append(f"residual {res:.3g}")
        if bad:
            viol.append(f"non-finite {bad}")
        if np.nanmax(checks["swe"]) > 1000.0 + 1.0:
            viol.append(f"swe {np.nanmax(checks['swe']):.1f} > cap")
        if np.nanmin(checks["zwt"]) < -1e-6 \
                or np.nanmax(checks["zwt"]) > 80.0 + 1e-6:
            viol.append("zwt out of [0, 80]")
        if np.nanmin(checks["c_slow"]) < -1e-6:
            viol.append("negative slow carbon")
        status = "CLEAN" if not viol else "VIOLATION: " + "; ".join(viol)
        print(f"year {year}: max|res|={res:.3g} mm  "
              f"swe_max={np.nanmax(checks['swe']):.0f}  "
              f"zwt_mean={np.nanmean(checks['zwt']):.2f}  "
              f"c_slow_mean={np.nanmean(checks['c_slow']):.0f}  "
              f"{status}", flush=True)
        ok &= not viol
    dtw = time.perf_counter() - t0
    print(f"{args.years} flagship years in {dtw:.0f}s "
          f"({'ALL CLEAN' if ok else 'VIOLATIONS FOUND'})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
