"""Full-archive-scale test of the PGF forcing ingest path.

Synthesizes a PGF v2.1-layout decade archive (7 variables x 3653 days x
360x720 float32 ~ 26 GB, file naming per READ_PGF.f90:22-109) and times a
multi-year global 0.5-degree run driven by it through
NetCDFForcingProvider + PrefetchingProvider + the native packer — the
configuration STATUS.md flagged as untested at archive scale.

Usage:
    python scripts/pgf_scale_test.py [--years 2] [--dir .pgf_scratch]
    python scripts/pgf_scale_test.py --keep   # don't delete the archive

The archive is written under the repo (gitignored) and deleted at the end
unless --keep is given.
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

NY, NX = 360, 720
DECADE = (1901, 1910)
NDAYS = 3653                      # 1901-1910 incl. leap days


def synth_day_fields(doy: int, lat2d: np.ndarray, noise_bank: np.ndarray
                     ) -> dict:
    """Cheap physical-range daily fields (values matter less than bytes)."""
    season = np.cos(2.0 * np.pi * (doy - 200.0) / 365.0)
    nz = noise_bank[doy % noise_bank.shape[0]]
    latr = np.deg2rad(lat2d)
    tas = (288.0 + 25.0 * np.cos(latr) - 15.0
           + 12.0 * season * np.sign(lat2d) + 3.0 * nz)
    rsds = np.maximum(
        0.0, 180.0 * np.cos(latr) + 80.0 * season * np.sign(lat2d)
        + 30.0 * nz)
    rlds = 180.0 + 1.2 * (tas - 230.0) + 10.0 * nz
    huss = np.clip(0.012 * np.exp((tas - 288.0) / 18.0) * (1 + 0.2 * nz),
                   1e-4, 0.03)
    ps = 101325.0 - 800.0 * np.abs(lat2d) / 90.0 + 100.0 * nz
    wet = nz > 0.3
    pr = np.where(wet, 8.0e-5 * (1.0 + nz), 0.0)
    rhs = np.clip(70.0 + 20.0 * nz, 5.0, 100.0)
    return dict(tas=tas, rlds=rlds, rsds=rsds, huss=huss, ps=ps, pr=pr,
                rhs=rhs)


def make_archive(base: str) -> None:
    import h5py

    from hybrid9_tpu.data.forcing import PGF_VARIABLES, pgf_decade_path

    os.makedirs(base, exist_ok=True)
    lat = 90.0 - 0.25 - 0.5 * np.arange(NY)
    lat2d = np.repeat(lat[:, None], NX, 1).astype(np.float32)
    rng = np.random.RandomState(0)
    noise_bank = rng.standard_normal((16, NY, NX)).astype(np.float32)

    handles, files = {}, {}
    for var in PGF_VARIABLES:
        path = pgf_decade_path(base, var, DECADE[0])
        handles[var] = h5py.File(path, "w")
        files[var] = handles[var].create_dataset(
            var, shape=(NDAYS, NY, NX), dtype="f4",
            chunks=(32, NY, NX))

    t0 = time.perf_counter()
    slab = 64
    for start in range(0, NDAYS, slab):
        n = min(slab, NDAYS - start)
        bufs = {v: np.empty((n, NY, NX), np.float32)
                for v in PGF_VARIABLES}
        for d in range(n):
            day = start + d
            fields = synth_day_fields(day % 365 + 1, lat2d, noise_bank)
            for v in PGF_VARIABLES:
                bufs[v][d] = fields[v]
        for v in PGF_VARIABLES:
            files[v][start:start + n] = bufs[v]
        if start % 512 == 0:
            print(f"  archive: day {start}/{NDAYS} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    for f in handles.values():
        f.close()
    size = sum(os.path.getsize(os.path.join(base, p))
               for p in os.listdir(base))
    print(f"archive complete: {size / 1e9:.1f} GB in "
          f"{time.perf_counter() - t0:.0f}s")


def run_timed(base: str, n_years: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import (NetCDFForcingProvider,
                                          PrefetchingProvider)
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=0.5, start_year=1901,
                 end_year=1900 + n_years, forcing="pgf",
                 forcing_path=base, forcing_block_days=122,
                 write_annual=False)
    grid, params = load_soil(cfg)
    provider = PrefetchingProvider(NetCDFForcingProvider(base, grid))
    sim = Simulation(cfg, params, land_grid=grid)
    t0 = time.perf_counter()
    sim.run(provider)
    wall = time.perf_counter() - t0
    ndays = sum(365 + (y % 4 == 0) for y in range(1901, 1901 + n_years))
    print(f"PGF-driven run: {n_years} years, {grid.n_land} land cells, "
          f"{wall:.1f}s wall ({wall / n_years:.1f} s/yr, "
          f"{grid.n_land * ndays / wall / 1e6:.2f} M cell-days/s)")
    worst = max(float(np.max(m["max_abs_residual"][:grid.n_land]))
                for m in sim.annual_results)
    print(f"max|residual| over run: {worst:.3g} mm")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=2)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    base = args.dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".pgf_scratch")
    try:
        if not os.path.exists(os.path.join(
                base, "tas_pgfv2.1_1901_1910.nc4")):
            make_archive(base)
        run_timed(base, args.years)
    finally:
        if not args.keep and os.path.isdir(base):
            shutil.rmtree(base)
            print(f"removed {base}")


if __name__ == "__main__":
    main()
