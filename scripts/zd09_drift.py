"""Climatological bound on the zd09_every approximation (VERDICT r3
item 3).

``Config.zd09_every=8`` refreshes the Zeng & Decker (2009) equilibrium
profile and the drainage specific-yield profile every 8 substeps (every
4 h at NISURF=48) instead of every substep (exact reference behavior,
HYDROLOGY.f90:512-590).  The 20-day trajectory bound
(tests/test_zd09_refresh.py) does not by itself justify a century-scale
production default — this script produces the climatological numbers:

  paired global runs, SAME forcing, k=1 vs k=8, over N years
  (default 10).  For each annual diagnostic (evap, rnf, theta_total)
  and the end-of-year water table, report
    - the raw max/mean absolute k8-k1 drift per year,
    - that drift normalised by the field's own per-cell interannual
      std (from the k=1 run) — the acceptance metric,
    - the drift's time trend (does it accumulate, or is it stationary
      weather-scale decorrelation noise?).

Reference scope (hydrology + growth; snow/ice/carbon/routing off) so
the approximation is isolated.  Runs the production path (Pallas on
TPU, XLA elsewhere).

Usage: python scripts/zd09_drift.py [--years 10] [--resolution 0.5]
Prints one summary line per field; writes zd09_drift.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_paired(years: int, resolution: float, nisurf: int,
               ks=(1, 8), use_pallas=None):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    out = {}
    for k in ks:
        cfg = Config(resolution_deg=resolution, start_year=1901,
                     end_year=1900 + years, nisurf=nisurf,
                     zd09_every=k, snow=False, snow_albedo=False,
                     frozen_soil=False, soil_ice=False, carbon=False,
                     lateral_routing=False, write_annual=False,
                     use_pallas=use_pallas)
        grid, params = load_soil(cfg)
        provider = SyntheticForcingProvider(grid.n_padded, seed=0,
                                            lat=grid.cell_lat)
        sim = Simulation(cfg, params, land_grid=grid)
        nl = grid.n_land
        rec = {f: [] for f in ("evap", "rnf", "theta_total", "zwt")}
        t0 = time.perf_counter()
        for year in range(cfg.start_year, cfg.end_year + 1):
            means = sim.run_year(year, provider)
            rec["evap"].append(np.asarray(means["evap"])[:nl])
            rec["rnf"].append(np.asarray(means["rnf"])[:nl])
            rec["theta_total"].append(
                np.asarray(means["theta_total"])[:nl])
            rec["zwt"].append(np.asarray(sim.state.soil.zwt)[:nl])
        print(f"k={k}: {years} years in {time.perf_counter()-t0:.0f}s "
              f"({grid.n_land} land cells, pallas={sim.use_pallas})")
        out[k] = {f: np.stack(v) for f, v in rec.items()}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=10)
    ap.add_argument("--resolution", type=float, default=0.5)
    ap.add_argument("--nisurf", type=int, default=48)
    ap.add_argument("--out", default="zd09_drift.json")
    ap.add_argument("--ks", default="1,8",
                    help="comma-separated zd09_every values to run")
    ap.add_argument("--no-pallas", action="store_true",
                    help="force the XLA path (isolate kernel effects)")
    args = ap.parse_args()
    ks = tuple(int(v) for v in args.ks.split(","))

    out = run_paired(args.years, args.resolution, args.nisurf, ks=ks,
                     use_pallas=False if args.no_pallas else None)
    for k in ks:
        for f in ("evap", "zwt"):
            bad = int(np.sum(~np.isfinite(out[k][f])))
            if bad:
                print(f"k={k} {f}: {bad} NON-FINITE entries")
    if len(ks) < 2:
        return 0
    report = {}
    for f in ("evap", "rnf", "theta_total", "zwt"):
        a1, a8 = out[ks[0]][f], out[ks[1]][f]      # [years, n_land]
        diff = np.abs(a8 - a1)
        # Per-cell interannual std of the exact run (the natural
        # variability yardstick); floor avoids 0/0 in dead cells.
        std = np.std(a1, axis=0, ddof=1)
        scale = np.maximum(std, 1.0e-12)
        ratio = np.mean(diff, axis=0) / scale      # per cell
        per_year = np.mean(diff, axis=1)           # domain-mean |drift|
        # Trend: is late-half drift larger than early-half?
        half = args.years // 2
        trend = float(np.mean(per_year[half:])
                      / max(np.mean(per_year[:half]), 1.0e-30))
        report[f] = dict(
            mean_abs_drift=float(np.mean(diff)),
            max_abs_drift=float(np.max(diff)),
            mean_ratio_to_interannual_std=float(np.mean(ratio)),
            p99_ratio_to_interannual_std=float(
                np.percentile(ratio, 99)),
            late_vs_early_drift_ratio=trend,
        )
        print(f"{f:12s}: mean|d|={report[f]['mean_abs_drift']:.3e} "
              f"max|d|={report[f]['max_abs_drift']:.3e} "
              f"mean ratio={report[f]['mean_ratio_to_interannual_std']:.3f} "
              f"p99 ratio={report[f]['p99_ratio_to_interannual_std']:.3f} "
              f"late/early={trend:.2f}")
    with open(args.out, "w") as fjson:
        json.dump(dict(years=args.years, resolution=args.resolution,
                       nisurf=args.nisurf, fields=report), fjson,
                  indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
