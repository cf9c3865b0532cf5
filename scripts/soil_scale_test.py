"""Archive-scale raw-soil ingest test.

The soil-side analog of scripts/pgf_scale_test.py: synthesizes a
full-size BNU-layout raw archive on disk (default: global 0.5-degree
model grid at 30x fine resolution = 21600 x 10800 per field, 8 layers x
4 variables ~ 30 GB, the same scale as the 26 GB PGF decade test;
--factor 60 gives the true 30-arc-sec 43200 x 21600 layout, ~119 GB,
disk permitting), then runs the production pipeline end-to-end:

    raw archives -> prepare_soil (band-chunked hyperslab reads +
    native box-average regrid) -> load_soil -> SoilParams ->
    one simulated year on the device.

Reference: INIT.f90:473-726 (the reference re-runs this regrid at every
model start; we run it once offline).  Usage:

    python scripts/soil_scale_test.py [--factor 30] [--layers 8]
        [--res 0.5] [--workdir .soil_scratch] [--keep]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=30,
                    help="fine-to-model resolution ratio (60 = BNU "
                         "30-arc-sec at 0.5 deg)")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--res", type=float, default=0.5)
    ap.add_argument("--workdir", default=".soil_scratch")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized archive on exit")
    ap.add_argument("--skip-year", action="store_true",
                    help="stop after load_soil (no device run)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.data.synthetic import synthesize_raw_soil_archive
    from hybrid9_tpu.io.native import available as native_available

    os.makedirs(args.workdir, exist_ok=True)
    ny = int(round(180.0 / args.res))
    nx = int(round(360.0 / args.res))
    fy, fx = ny * args.factor, nx * args.factor
    n_fields = args.layers * 4
    gb = fy * fx * 4 * n_fields / 2**30
    print(f"[1/3] synthesizing archive: {n_fields} fields of "
          f"{fy}x{fx} f32 (~{gb:.1f} GB) under {args.workdir}",
          flush=True)
    t0 = time.perf_counter()
    arch = synthesize_raw_soil_archive(
        args.workdir, resolution_deg=args.res, factor=args.factor,
        n_layers=args.layers, seed=11, band_coarse_rows=16)
    t_synth = time.perf_counter() - t0
    du = sum(os.path.getsize(os.path.join(args.workdir, f))
             for f in os.listdir(args.workdir))
    print(f"      synthesized in {t_synth:.0f}s, {du / 2**30:.1f} GB "
          f"on disk", flush=True)

    print(f"[2/3] prepare_soil (native regrid: {native_available()})",
          flush=True)
    t0 = time.perf_counter()
    cfg = Config(resolution_deg=args.res,
                 start_year=1901, end_year=1901,
                 soil_source="raw",
                 soil_hwsd_path=arch["hwsd"],
                 soil_bnu_dir=arch["bnu_dir"],
                 soil_fmax_path=arch["fmax"],
                 soil_path=os.path.join(args.workdir, "soil_prep.nc"),
                 forcing="device-synthetic",
                 output_path=os.path.join(args.workdir, "out"),
                 write_annual=False)
    grid, params = load_soil(cfg)
    t_prep = time.perf_counter() - t0
    rate = gb / t_prep
    print(f"      raw -> SoilParams in {t_prep:.0f}s "
          f"({rate:.2f} GB/s archive read+regrid), "
          f"{grid.n_land} land cells", flush=True)
    # Truth check: packed theta_s matches the synthesizer's coarse truth.
    truth = arch["truth"]["theta_s"][:, :, 0] / 1.0e3
    packed_truth = grid.pack(truth, fill=np.nan)[:grid.n_land]
    got = np.asarray(params.theta_s[:, 0])[:grid.n_land]
    ok = np.isfinite(packed_truth)
    err = np.nanmax(np.abs(got[ok] - packed_truth[ok])
                    / np.abs(packed_truth[ok]))
    # +-5 % uniform sub-grid noise averages down as 0.029/factor per
    # box; allow 6 standard errors (plus a float32-storage floor).
    tol = max(0.005, 6.0 * 0.0289 / args.factor)
    print(f"      max rel err vs coarse truth: {err:.3g} "
          f"(tol {tol:.3g})", flush=True)
    assert err < tol, "regrid diverged from coarse truth"

    if not args.skip_year:
        print("[3/3] one simulated year on device", flush=True)
        from hybrid9_tpu.data.device_forcing import \
            DeviceSyntheticForcingProvider
        from hybrid9_tpu.run import Simulation
        sim = Simulation(cfg, params, land_grid=grid)
        provider = DeviceSyntheticForcingProvider(
            grid.n_padded, seed=0, lat=grid.cell_lat)
        t0 = time.perf_counter()
        means = sim.run_year(1901, provider)
        t_year = time.perf_counter() - t0
        worst = float(np.max(means["max_abs_residual"][:grid.n_land]))
        print(f"      year in {t_year:.1f}s wall, max|residual| "
              f"{worst:.3g} mm", flush=True)
        assert worst < 0.1

    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)
    print("SOIL SCALE TEST OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
