"""The reference's flagship experiment, all new physics on.

Reproduces the 1901-2012 configuration (112 years, global 0.5 degrees;
the reference took 114 min on 64 Sandy Bridge cores, notes.txt:31) with
every capability enabled: Pallas day kernel, snowpack, frozen-soil
impedance, sub-daily kinematic-wave routing, annual NetCDF output and
decadal checkpoints.  On-device synthetic forcing stands in for the PGF
archive (not on this machine; scripts/pgf_scale_test.py covers the real
ingest path at archive scale).

    python scripts/flagship_run.py [--years 112] [--out /tmp/flagship]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=112)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.device_forcing import (
        DeviceSyntheticForcingProvider)
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.io.checkpoint import Checkpointer
    from hybrid9_tpu.io.writer import AnnualWriter
    from hybrid9_tpu.run import Simulation

    out = args.out or tempfile.mkdtemp(prefix="flagship_")
    cfg = Config(resolution_deg=0.5, start_year=1901,
                 end_year=1900 + args.years, forcing="device-synthetic",
                 forcing_block_days=366, output_path=out,
                 routing_scheme="kinematic",
                 checkpoint_every_years=10,
                 checkpoint_path=os.path.join(out, "ckpt"))
    grid, params = load_soil(cfg)
    provider = DeviceSyntheticForcingProvider(
        grid.n_padded, seed=0, lat=grid.cell_lat)
    sim = Simulation(cfg, params, land_grid=grid)
    writer = AnnualWriter(out, grid)
    ck = Checkpointer(cfg.checkpoint_path)

    t0 = time.perf_counter()
    sim.run(provider, writer=writer, checkpointer=ck)
    wall = time.perf_counter() - t0

    worst = max(float(np.max(m["max_abs_residual"][:grid.n_land]))
                for m in sim.annual_results)
    files = [f for f in os.listdir(out) if f.startswith("axy")]
    swe_mean = float(np.mean(
        sim.annual_results[-1]["swe"][:grid.n_land]))
    print(f"flagship: {args.years} years, {grid.n_land} land cells, "
          f"{wall / 60.0:.1f} min wall ({wall / args.years:.2f} s/yr), "
          f"{len(files)} annual files, worst residual {worst:.3g} mm, "
          f"final-year mean SWE {swe_mean:.1f} mm")
    print(f"output: {out}")


if __name__ == "__main__":
    main()
