"""Command-line interface.

Replaces the reference's driver.txt + slurm_submit launch path
(EXECUTE/driver.txt; EXECUTE/slurm_submit) with a proper CLI:

    python -m hybrid9_tpu run   --config run.json [--years 1901 1910]
    python -m hybrid9_tpu site  --csv-out site.csv [--spinup 10]
    python -m hybrid9_tpu info

Multi-host TPU runs launch the same command on every host (one process
per host); `parallel.initialize_distributed` picks up the standard JAX
cluster environment.
"""

from __future__ import annotations

import argparse
import sys

from .utils.logging import get_logger

log = get_logger(__name__)


def cmd_run(args: argparse.Namespace) -> int:
    import jax

    from .config import Config
    from .data.forcing import (PrefetchingProvider,
                               SyntheticForcingProvider)
    from .data.soil import load_soil
    from .io.writer import AnnualWriter
    from .parallel.launch import initialize_distributed
    from .parallel.sharding import CellSharding
    from .run import Simulation

    if args.platform:
        # Must land before any backend use; the environment's TPU plugin
        # overrides JAX_PLATFORMS, but the config knob wins.
        jax.config.update("jax_platforms", args.platform)
    initialize_distributed()
    if args.config:
        cfg = Config.from_json(open(args.config).read())
    else:
        cfg = Config()
    if args.years:
        cfg = Config(**{**cfg.__dict__, "start_year": args.years[0],
                        "end_year": args.years[1]})
    if args.focus:
        # INTERACTIVE mode: "--focus site-name" or "--focus lon,lat"
        # (the reference's focus-point debug mode, driver.txt:28-60).
        from .site import DEBUG_SITES
        if args.focus in DEBUG_SITES:
            lon, lat = DEBUG_SITES[args.focus]
        else:
            lon, lat = (float(v) for v in args.focus.split(","))
        cfg = Config(**{**cfg.__dict__, "interactive": True,
                        "site_lon": lon, "site_lat": lat})
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    grid, params = load_soil(cfg)
    sharding = CellSharding.create() if args.shard else None
    if sharding is not None:
        sharding.check_divisible(grid.n_padded)
    state = None
    start_year = cfg.start_year
    if args.resume:
        import jax.numpy as jnp

        from .io.checkpoint import Checkpointer
        from .state import initial_state
        lg = cfg.layer_grid()
        # The template must match the configured dtype or Orbax's abstract
        # restore builds the wrong leaves for float64 runs.
        template = initial_state(params, lg.dz, lg.zi,
                                 jnp.dtype(cfg.dtype))
        ck = Checkpointer(cfg.checkpoint_path)
        year, state = ck.restore(template)
        start_year = year + 1
        cfg = Config(**{**cfg.__dict__, "start_year": start_year})
        log.info("resumed from checkpoint year %d", year)
    # Multi-host: each process reads/writes only its slab of the packed
    # cell axis (READ_NET_CDF_3DR.f90:95-97 / WRITE_NET_CDF_3DR.f90:
    # 211-257 ownership pattern); requires --shard.
    multihost = jax.process_count() > 1
    if multihost and sharding is None:
        raise SystemExit("multi-host runs require --shard")
    host_slice = None
    if multihost:
        from .parallel.launch import host_shard_bounds
        lo, hi = host_shard_bounds(grid.n_padded)
        host_slice = slice(lo, hi)
    if cfg.forcing == "pgf" and cfg.forcing_path:
        from .data.forcing import NetCDFForcingProvider
        local = NetCDFForcingProvider(cfg.forcing_path, grid,
                                      cell_slice=host_slice)
        if multihost:
            from .data.forcing import HostShardedProvider
            local = HostShardedProvider(local, sharding, grid.n_padded)
        provider = PrefetchingProvider(local)
    elif cfg.forcing == "device-synthetic":
        from .data.device_forcing import DeviceSyntheticForcingProvider
        provider = DeviceSyntheticForcingProvider(
            grid.n_padded, seed=0, lat=grid.cell_lat, sharding=sharding)
    else:
        local = SyntheticForcingProvider(
            grid.n_padded, seed=0, lat=grid.cell_lat,
            cell_slice=host_slice)
        if multihost:
            from .data.forcing import HostShardedProvider
            local = HostShardedProvider(local, sharding, grid.n_padded)
        provider = PrefetchingProvider(local)

    sim = Simulation(cfg, params, state=state, sharding=sharding,
                     land_grid=grid)
    writer = None
    if cfg.write_annual:
        if multihost:
            from .io.writer import ShardedAnnualWriter
            writer = ShardedAnnualWriter(cfg.output_path, grid,
                                         host_slice.start, host_slice.stop)
        else:
            writer = AnnualWriter(cfg.output_path, grid)
    checkpointer = None
    if cfg.checkpoint_every_years:
        from .io.checkpoint import Checkpointer
        checkpointer = Checkpointer(cfg.checkpoint_path)
    sim.run(provider, writer=writer, checkpointer=checkpointer)
    return 0


def cmd_site(args: argparse.Namespace) -> int:
    from .config import Config
    from .site import (read_site_climate_csv, read_site_subdaily_csv,
                       run_site)

    cfg = Config(spinup_years=args.spinup, nisurf=args.nisurf)
    climate = None
    if args.climate:
        climate = read_site_climate_csv(args.climate)
    subdaily = None
    if args.subdaily:
        subdaily = read_site_subdaily_csv(args.subdaily, cfg.nisurf)
    result = run_site(cfg, climate=climate, subdaily=subdaily,
                      csv_out=args.csv_out, engine=args.engine)
    worst = max(r["max_residual"] for r in result.daily)
    log.info("site run done (engine=%s): %d days, final LAI %.3f, "
             "max|residual| %.3g mm", args.engine, len(result.daily),
             result.daily[-1]["lai"], worst)
    return 0


def cmd_prep_soil(args: argparse.Namespace) -> int:
    """One-time soil preprocessing: raw HWSD/BNU archives -> the
    per-layer parameter file `run` consumes (soil_source='netcdf').
    The offline analog of the reference's INIT-time soil regrid
    (INIT.f90:473-680), which it recomputed at every model start."""
    from .data.soil_raw import prepare_soil

    prepare_soil(args.hwsd, args.bnu_dir, args.out,
                 n_layers=args.layers, fmax_path=args.fmax,
                 pattern=args.pattern,
                 band_coarse_rows=args.band_rows)
    return 0


def cmd_info(args: argparse.Namespace) -> int:
    import jax

    from . import __version__
    print(f"hybrid9-tpu {__version__}")
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"{jax.device_count()} device(s)")
    for d in jax.devices():
        print(f"  {d}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="hybrid9_tpu",
                                description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    pr = sub.add_parser("run", help="global simulation")
    pr.add_argument("--config", help="Config JSON file")
    pr.add_argument("--years", nargs=2, type=int, metavar=("S", "E"))
    pr.add_argument("--shard", action="store_true",
                    help="shard cells over all local devices")
    pr.add_argument("--cache-dir", default=".jax_cache",
                    help="persistent XLA compilation cache")
    pr.add_argument("--platform", default=None,
                    help="force a JAX backend (e.g. 'cpu'); overrides "
                         "the environment's plugin selection")
    pr.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint")
    pr.add_argument("--focus", default=None, metavar="SITE|LON,LAT",
                    help="INTERACTIVE mode: daily CSV for one focus cell "
                         "(site name from site.DEBUG_SITES or lon,lat)")
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("site", help="single-column site simulation")
    ps.add_argument("--climate", help="daily climate CSV")
    ps.add_argument("--subdaily",
                    help="sub-daily observation CSV (doy, step, tak, rh, "
                         "rnet, par, ppt, evap_obs)")
    ps.add_argument("--csv-out", default="site_daily.csv")
    ps.add_argument("--spinup", type=int, default=0)
    ps.add_argument("--nisurf", type=int, default=48)
    ps.add_argument("--engine", choices=("oracle", "kernel"),
                    default="oracle",
                    help="float64 NumPy oracle or the production jitted "
                         "kernels (the TPU code path)")
    ps.set_defaults(fn=cmd_site)

    pp = sub.add_parser("prep-soil",
                        help="preprocess raw HWSD/BNU soil archives")
    pp.add_argument("--hwsd", required=True,
                    help="HWSD texture NetCDF (soil_tex at model res)")
    pp.add_argument("--bnu-dir", required=True,
                    help="directory of BNU per-layer archive files")
    pp.add_argument("--out", required=True,
                    help="output preprocessed soil file")
    pp.add_argument("--fmax", default=None, help="Fmax NetCDF (optional)")
    pp.add_argument("--layers", type=int, default=8)
    pp.add_argument("--pattern", default="{var}_l{layer}.nc4")
    pp.add_argument("--band-rows", type=int, default=32,
                    help="coarse rows regridded per read (memory bound)")
    pp.set_defaults(fn=cmd_prep_soil)

    pi = sub.add_parser("info", help="version and device info")
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
