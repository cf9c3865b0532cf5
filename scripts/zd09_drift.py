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

Two scopes (``--scope``):

- ``reference`` (hydrology + growth; snow/ice/carbon/routing off) —
  isolates the approximation itself.
- ``flagship`` (VERDICT r4 item 2) — the SHIPPED production defaults
  (snow + albedo + soil ice/thermal + carbon + routing), which interact
  with the water table (impedance gates infiltration, melt pulses move
  zwt, decomposition reads theta): bounds the approximation on the
  configuration users actually run, adding swe / soil_ice / c_soil /
  nee / discharge to the audited fields.

Runs the production path (Pallas on TPU, XLA elsewhere).

Usage: python scripts/zd09_drift.py [--years 10] [--scope flagship]
Prints one summary line per field; updates zd09_drift.json under the
scope's key.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


REFERENCE_FIELDS = ("evap", "rnf", "theta_total", "zwt")
FLAGSHIP_FIELDS = REFERENCE_FIELDS + ("swe", "soil_ice", "c_soil",
                                      "nee", "discharge")


def run_paired(years: int, resolution: float, nisurf: int,
               ks=(1, 8), use_pallas=None, scope: str = "reference"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    fields = (FLAGSHIP_FIELDS if scope == "flagship"
              else REFERENCE_FIELDS)
    out = {}
    for k in ks:
        if scope == "flagship":
            # SHIPPED defaults (config.py): snow + albedo + frozen soil
            # + prognostic ice/thermal + carbon + routing all on — only
            # the knob under study varies.
            cfg = Config(resolution_deg=resolution, start_year=1901,
                         end_year=1900 + years, nisurf=nisurf,
                         zd09_every=k, write_annual=False,
                         use_pallas=use_pallas)
        else:
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
        rec = {f: [] for f in fields}
        t0 = time.perf_counter()
        for year in range(cfg.start_year, cfg.end_year + 1):
            means = sim.run_year(year, provider)
            for f in fields:
                if f == "zwt":
                    rec[f].append(np.asarray(sim.state.soil.zwt)[:nl])
                else:
                    rec[f].append(np.asarray(means[f])[:nl])
        print(f"k={k}: {years} {scope} years in "
              f"{time.perf_counter()-t0:.0f}s ({grid.n_land} land "
              f"cells, pallas={sim.use_pallas})")
        out[k] = {f: np.stack(v) for f, v in rec.items()}
    return out, fields


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=10)
    ap.add_argument("--resolution", type=float, default=0.5)
    ap.add_argument("--nisurf", type=int, default=48)
    ap.add_argument("--out", default="zd09_drift.json")
    ap.add_argument("--ks", default="1,8",
                    help="comma-separated zd09_every values to run")
    ap.add_argument("--scope", default="reference",
                    choices=("reference", "flagship"))
    ap.add_argument("--save-raw", default=None,
                    help="npz path for the raw [years, n_land] per-field"
                         " records of both arms (metric forensics)")
    ap.add_argument("--from-raw", default=None,
                    help="re-analyse a --save-raw npz instead of "
                         "re-running the paired integration")
    ap.add_argument("--no-pallas", action="store_true",
                    help="force the XLA path (isolate kernel effects)")
    args = ap.parse_args()
    ks = tuple(int(v) for v in args.ks.split(","))

    if args.from_raw:
        with np.load(args.from_raw) as d:
            fields = sorted({k.split("_", 1)[1] for k in d.files})
            out = {k: {f: d[f"k{k}_{f}"] for f in fields} for k in ks}
    else:
        out, fields = run_paired(
            args.years, args.resolution, args.nisurf, ks=ks,
            use_pallas=False if args.no_pallas else None,
            scope=args.scope)
    if args.save_raw and not args.from_raw:
        np.savez_compressed(args.save_raw,
                            **{f"k{k}_{f}": out[k][f]
                               for k in ks for f in fields})
        print(f"raw records -> {args.save_raw}")
    for k in ks:
        for f in ("evap", "zwt"):
            bad = int(np.sum(~np.isfinite(out[k][f])))
            if bad:
                print(f"k={k} {f}: {bad} NON-FINITE entries")
    if len(ks) < 2:
        return 0
    # Acceptance (metric v2, r5): drift must vanish under natural
    # variability.  Per field, sigma = pooled interannual std (RMS of
    # the per-cell stds from the exact run).  Cells whose own std is
    # >= 5 % of sigma are "varying": their per-cell drift/std ratios
    # must satisfy mean < 5 %, p99 < 10 % (the r4 bound).  The rest are
    # "quasi-static" (a static water table under ice, tropical swe=0,
    # ...): a per-cell ratio there is 0/0 noise — instead their drift
    # is bounded ABSOLUTELY, p99 < 1 % of sigma.  A field inert in both
    # arms (sigma == 0) passes iff its drift is exactly zero.
    BOUND_MEAN, BOUND_P99, BOUND_STATIC = 0.05, 0.10, 0.01
    report = {}
    all_pass = True
    for f in fields:
        a1, a8 = out[ks[0]][f], out[ks[1]][f]      # [years, n_land]
        diff = np.abs(a8 - a1)
        md = np.mean(diff, axis=0)                 # per-cell mean drift
        std = np.std(a1, axis=0, ddof=1)
        sigma = float(np.sqrt(np.mean(std ** 2)))  # pooled variability
        per_year = np.mean(diff, axis=1)           # domain-mean |drift|
        half = max(1, len(per_year) // 2)
        trend = float(np.mean(per_year[half:])
                      / max(np.mean(per_year[:half]), 1.0e-30))
        if sigma == 0.0:
            ok = float(np.max(diff)) == 0.0
            mean_ratio = p99_ratio = 0.0
            n_var = 0
            static_p99 = float(np.percentile(md, 99)) if md.size else 0.0
        else:
            varying = std >= 0.05 * sigma
            n_var = int(varying.sum())
            if n_var:
                r = md[varying] / std[varying]
                mean_ratio = float(np.mean(r))
                p99_ratio = float(np.percentile(r, 99))
            else:
                mean_ratio = p99_ratio = 0.0
            static_p99 = (float(np.percentile(md[~varying], 99))
                          if (~varying).any() else 0.0)
            ok = (mean_ratio < BOUND_MEAN and p99_ratio < BOUND_P99
                  and static_p99 < BOUND_STATIC * sigma)
        all_pass &= ok
        report[f] = dict(
            mean_abs_drift=float(np.mean(diff)),
            max_abs_drift=float(np.max(diff)),
            pooled_interannual_std=sigma,
            n_varying_cells=n_var,
            mean_ratio_to_interannual_std=mean_ratio,
            p99_ratio_to_interannual_std=p99_ratio,
            static_cells_p99_drift=static_p99,
            late_vs_early_drift_ratio=trend,
            passes_bound=ok,
        )
        print(f"{f:12s}: mean|d|={report[f]['mean_abs_drift']:.3e} "
              f"max|d|={report[f]['max_abs_drift']:.3e} "
              f"sigma={sigma:.3e} "
              f"ratio mean={mean_ratio:.4f} p99={p99_ratio:.4f} "
              f"static p99|d|={static_p99:.3e} "
              f"late/early={trend:.2f} "
              f"{'PASS' if ok else 'FAIL'}")
    # The JSON keeps one entry per scope so both audits coexist.
    try:
        with open(args.out) as fjson:
            doc = json.load(fjson)
        if "fields" in doc:       # legacy single-scope layout
            doc = {"reference": doc}
    except (OSError, ValueError):
        doc = {}
    doc[args.scope] = dict(years=args.years, resolution=args.resolution,
                           nisurf=args.nisurf, metric="v2",
                           bound=dict(mean=BOUND_MEAN, p99=BOUND_P99,
                                      static_p99_of_sigma=BOUND_STATIC),
                           all_pass=all_pass, fields=report)
    with open(args.out, "w") as fjson:
        json.dump(doc, fjson, indent=2)
    print(f"wrote {args.out} ({args.scope}: "
          f"{'ALL PASS' if all_pass else 'BOUND EXCEEDED'})")
    return 0 if all_pass else 1


if __name__ == "__main__":
    sys.exit(main())
