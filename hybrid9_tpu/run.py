"""Simulation driver: years of day-blocks with annual diagnostics.

TPU-native replacement for the reference's main program loop nest
(SOURCE/HYBRID9.f90:87-332, PROGRAM H9): the decade -> cell -> year -> day
ordering becomes year -> forcing-block -> (jitted scan over days x cells),
i.e. time-outer / cells-vectorized instead of the reference's cell-outer /
time-inner.  Forcing is streamed block-by-block with prefetch so HBM holds
one block, not a decade (the reference's own profiling showed I/O
dominating — notes.txt:44-56).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import calendar
from .config import Config
from .physics.hydrology import Geometry
from .state import (AnnualAccumulators, Forcing, ModelState, SoilParams,
                    initial_state)
from .step import annual_means, block_step, block_step_donated
from .utils.logging import get_logger

log = get_logger(__name__)


class Simulation:
    """Owns compiled step functions, state, and the run loop."""

    def __init__(self, cfg: Config, params: SoilParams,
                 state: Optional[ModelState] = None,
                 sharding=None, land_grid=None):
        self.cfg = cfg
        self.grid = cfg.layer_grid()
        self.dtype = jnp.dtype(cfg.dtype)
        self.geom = Geometry.from_layer_grid(self.grid, self.dtype)
        self.params = params
        self.sharding = sharding
        self.n = params.n_cells
        if state is None:
            state = initial_state(params, self.grid.dz, self.grid.zi,
                                  self.dtype)
        if sharding is not None:
            # put() assembles from per-host slabs under multi-host
            # execution (no host holds the global state).
            state = sharding.put(state)
            self.params = sharding.put(params)
        self.state = state
        # This host's slab of the cell axis (multi-host runs own
        # [host_lo, host_hi); single-host owns everything).
        self.host_lo, self.host_hi = 0, self.n
        if jax.process_count() > 1:
            from .parallel.launch import host_shard_bounds
            self.host_lo, self.host_hi = host_shard_bounds(self.n)
        self.mesh = sharding.mesh if sharding is not None else None
        per_device = (self.n // sharding.n_devices
                      if sharding is not None else self.n)
        if cfg.use_pallas is None:
            # Auto: the Pallas day kernel needs a real TPU backend and a
            # per-device cell count divisible by the block size.  Under a
            # mesh the kernel runs shard_map'd (pallas_day.py) so the
            # multi-chip production path keeps the Pallas speed.
            self.use_pallas = (jax.default_backend() == "tpu"
                               and per_device % cfg.pallas_block == 0)
        else:
            self.use_pallas = cfg.use_pallas
        if self.use_pallas and per_device % cfg.pallas_block != 0:
            raise ValueError(
                f"per-device cell count {per_device} not divisible by "
                f"pallas_block {cfg.pallas_block}; adjust Config."
                "cell_block/pallas_block or disable use_pallas")
        self.routing = None
        # "auto" resolves to the fastest correct form for the scheme: the
        # dense roll/halo form for the kinematic wave and Muskingum-Cunge
        # (the sub-daily schemes; 2.7x faster than the packed segment-sum
        # scatter on a TPU chip, and its halos are collective-permutes
        # under a sharded mesh), the packed segment-sum for the daily
        # linear reservoir (one scatter per day costs nothing to move).
        routing_form = cfg.routing_form
        if routing_form == "auto":
            routing_form = ("grid" if cfg.routing_scheme
                            in ("kinematic", "muskingum") else "packed")
        if routing_form == "grid" and cfg.routing_scheme not in (
                "kinematic", "muskingum"):
            raise ValueError(
                "routing_form='grid' is the dense halo-exchange form of "
                "the sub-daily routers; set routing_scheme='kinematic' "
                f"or 'muskingum' (got {cfg.routing_scheme!r})")
        if cfg.lateral_routing and land_grid is not None:
            from .grids.routing import (bankfull_width_m, cell_area_m2,
                                        flow_accumulation, flow_length_m,
                                        load_network, reach_slope,
                                        slope_from_accumulation)
            from .physics.routing import (KinematicParams,
                                          MuskingumParams, RoutingParams)
            down_np, elev = load_network(land_grid,
                                         cfg.routing_network_path)

            def _put(arr, dtype=None):
                arr = jnp.asarray(arr, dtype)
                if sharding is not None:
                    arr = jax.device_put(arr, sharding.spec_for(arr))
                return arr

            downstream = _put(down_np, jnp.int32)

            _put_dense = dense_sh = None
            if routing_form == "grid":
                # Dense halo-exchange machinery shared by both sub-daily
                # schemes (VERDICT r2 item 4): the per-direction rolls
                # lower to collective-permute halos; equivalence with
                # the packed segment-sum forms is pinned by
                # tests/test_routing.py.
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                from .grids.routing import direction_codes
                from .physics.routing import GridRouting
                codes = direction_codes(land_grid, down_np)
                length_g = land_grid.scatter(
                    flow_length_m(land_grid, down_np), fill=1.0)
                if sharding is not None:
                    # Shard the dense grid over the 1-D cell mesh
                    # along whichever spatial axis the device count
                    # divides (lat rows preferred): the rolls across
                    # that axis cross shard boundaries as
                    # collective-permute halo exchanges.
                    nd = sharding.n_devices
                    if land_grid.ny % nd == 0:
                        dense_sh = NamedSharding(
                            sharding.mesh, P(sharding.axis, None))
                    elif land_grid.nx % nd == 0:
                        dense_sh = NamedSharding(
                            sharding.mesh, P(None, sharding.axis))
                    else:
                        log.warning(
                            "grid routing: neither ny=%d nor nx=%d "
                            "divisible by %d devices; dense router "
                            "runs replicated", land_grid.ny,
                            land_grid.nx, nd)

                def _put_dense(arr, dtype):
                    arr = jnp.asarray(arr, dtype)
                    if dense_sh is not None:
                        arr = jax.device_put(arr, dense_sh)
                    return arr

                # Padding lanes point one past the dense grid: the
                # mode="drop" scatter in route_grid_day discards them
                # outright (no dump cell, so an all-land grid cannot
                # suffer a duplicate-index collision on cell 0), and
                # the gather-back clamp reads garbage that the `real`
                # mask then discards.
                flat_idx = np.full(self.n,
                                   land_grid.ny * land_grid.nx,
                                   np.int64)
                flat_idx[:land_grid.n_land] = land_grid.land_idx

                def _grid_routing(params):
                    return GridRouting(
                        params=params,
                        flat_idx=_put(flat_idx, jnp.int32),
                        n_land=int(land_grid.n_land),
                        ny=int(land_grid.ny), nx=int(land_grid.nx),
                        dense_sharding=dense_sh)

            if cfg.routing_scheme == "muskingum":
                acc = flow_accumulation(land_grid, down_np)
                if elev is None and cfg.routing_network_path is not None:
                    # Flow-direction-only file: no DEM to take reach
                    # drops from.  Synthetic elevation would fabricate
                    # slopes uncorrelated with the real topology; use
                    # the slope-area relation on the real network
                    # instead (grids/routing.slope_from_accumulation).
                    log.warning(
                        "%s has no 'elevation': Muskingum reach slopes "
                        "estimated from drainage area (Flint's law)",
                        cfg.routing_network_path)
                    slope_np = slope_from_accumulation(acc)
                else:
                    slope_np = reach_slope(land_grid, down_np,
                                           elevation=elev)
                if routing_form == "grid":
                    from .physics.routing import GridMuskingumParams
                    self.routing = _grid_routing(GridMuskingumParams(
                        dir_code=_put_dense(codes, jnp.int32),
                        flow_length=_put_dense(length_g, self.dtype),
                        slope=_put_dense(land_grid.scatter(
                            slope_np, fill=1.0e-3), self.dtype),
                        width=_put_dense(land_grid.scatter(
                            bankfull_width_m(acc), fill=1.0),
                            self.dtype),
                        cell_area=_put_dense(land_grid.scatter(
                            cell_area_m2(land_grid), fill=1.0),
                            self.dtype),
                        n_substeps=cfg.routing_substeps,
                        n_manning=cfg.routing_manning))
                else:
                    self.routing = MuskingumParams(
                        downstream=downstream,
                        flow_length=_put(flow_length_m(land_grid,
                                                       down_np)),
                        slope=_put(slope_np),
                        width=_put(bankfull_width_m(acc)),
                        cell_area=_put(cell_area_m2(land_grid)),
                        n_substeps=cfg.routing_substeps,
                        n_manning=cfg.routing_manning)
            elif cfg.routing_scheme == "kinematic":
                if routing_form == "grid":
                    from .physics.routing import GridKinematicParams
                    self.routing = _grid_routing(GridKinematicParams(
                        dir_code=_put_dense(codes, jnp.int32),
                        flow_length=_put_dense(length_g, self.dtype),
                        n_substeps=cfg.routing_substeps,
                        c0=cfg.routing_celerity))
                else:
                    self.routing = KinematicParams(
                        downstream=downstream,
                        flow_length=_put(flow_length_m(land_grid,
                                                       down_np)),
                        n_substeps=cfg.routing_substeps,
                        c0=cfg.routing_celerity)
            else:
                self.routing = RoutingParams(downstream=downstream,
                                             k=cfg.routing_k)
        self.lateral = None
        if cfg.lateral_groundwater and land_grid is not None:
            from .physics.lateral import make_lateral_params
            self.lateral = make_lateral_params(land_grid,
                                               k_lat=cfg.lateral_k)
        self.snow = None
        self.snow_albedo = None
        if cfg.snow:
            if cfg.snow_scheme == "twolayer":
                from .physics.snow import TwoLayerSnowParams
                self.snow = TwoLayerSnowParams(ddf=cfg.snow_ddf)
            else:
                from .physics.snow import SnowParams
                self.snow = SnowParams(ddf=cfg.snow_ddf)
            if cfg.snow_albedo:
                self.snow_albedo = (float(cfg.snow_alpha),
                                    float(cfg.snow_masking_swe))
        # INTERACTIVE mode: daily CSV diagnostics for one focus cell
        # (the reference's single-point debug mode, INIT.f90:220-236,
        # HYBRID9.f90:221-229).
        self.focus_idx = None
        self.focus_writer = None
        if cfg.interactive and land_grid is not None:
            self.focus_idx = land_grid.cell_index_of(cfg.site_lon,
                                                     cfg.site_lat)
            from .io.writer import FocusCSVWriter
            # One CSV per run: the primary process writes (focus rows are
            # replicated scalars under multi-host sharding).
            if jax.process_index() == 0:
                self.focus_writer = FocusCSVWriter(cfg.output_path)
            log.info("interactive focus cell: packed %d at (%.2f, %.2f)",
                     self.focus_idx, cfg.site_lon, cfg.site_lat)
        self.n_land = land_grid.n_land if land_grid is not None else None
        self.annual_results: List[Dict[str, np.ndarray]] = []

    def step_kwargs(self) -> Dict:
        """Keyword arguments configuring ``step.day_step`` for this run.

        One source of truth for the physics configuration shared by the
        production block step (run_year) and auxiliary drivers that need
        the identical model (carbon spin-up, ensembles).
        """
        cfg = self.cfg
        return dict(
            use_pallas=self.use_pallas, pallas_block=cfg.pallas_block,
            routing=self.routing, lateral=self.lateral, snow=self.snow,
            freeze=cfg.frozen_soil, vegetation=cfg.vegetation,
            soil_ice=cfg.frozen_soil and cfg.soil_ice,
            mesh=self.mesh if self.use_pallas else None,
            pallas_interpret=cfg.pallas_interpret,
            zd09_every=cfg.zd09_every, snow_albedo=self.snow_albedo,
            carbon=cfg.carbon and cfg.vegetation)

    def run_year(self, year: int,
                 forcing_provider: Callable[[int, int, int], Forcing],
                 block_days: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Simulate one calendar year; returns annual-mean diagnostics.

        ``forcing_provider(year, start_doy, n_days)`` must return a
        ``Forcing`` pytree of ``[n_days, n]`` arrays (see data/forcing.py).
        """
        cfg = self.cfg
        ndays = calendar.days_in_year(year)
        block_days = block_days or cfg.forcing_block_days
        acc = AnnualAccumulators.zeros(self.n, nsoil=self.grid.nsoil,
                                       dtype=self.dtype)
        if self.sharding is not None:
            acc = self.sharding.put(acc)

        t0 = time.perf_counter()
        doy = 1
        # Double-buffered forcing ingest: while the device integrates
        # block k, a background thread (PrefetchingProvider) builds block
        # k+1 — and, on the last block, next year's first block — so host
        # I/O overlaps device compute (replaces READ_PGF's decade reads;
        # the reference was I/O-bound, notes.txt:44-56).
        prefetch = getattr(forcing_provider, "prefetch", None)
        while doy <= ndays:
            nblk = min(block_days, ndays - doy + 1)
            if prefetch is not None:
                if doy + nblk <= ndays:
                    prefetch(year, doy + nblk,
                             min(block_days, ndays - (doy + nblk) + 1))
                elif year < cfg.end_year:
                    ndays_next = calendar.days_in_year(year + 1)
                    prefetch(year + 1, 1, min(block_days, ndays_next))
            block = forcing_provider(year, doy, nblk)
            # Donation (Config.donate_state) reuses the state/acc buffers
            # for the outputs; both are rebound from the return below,
            # so nothing references the donated inputs afterwards.
            step_fn = (block_step_donated if cfg.donate_state
                       else block_step)
            out = step_fn(
                self.state, acc, block, self.params, self.geom,
                cfg.dt, cfg.nisurf, focus_idx=self.focus_idx,
                **self.step_kwargs())
            if self.focus_idx is not None:
                self.state, acc, focus = out
                if self.focus_writer is not None:
                    self.focus_writer.append(year, doy, focus)
            else:
                self.state, acc = out
            doy += nblk

        means = annual_means(acc, cfg.nisurf)
        # Under multi-host execution each process extracts only its own
        # slab — the per-rank tile of the collective write
        # (WRITE_NET_CDF_3DR.f90:211-257); single-host gets everything.
        if self.sharding is not None and jax.process_count() > 1:
            means = {k: self.sharding.host_local(v)
                     for k, v in means.items()}
        else:
            means = {k: np.asarray(v) for k, v in means.items()}
        elapsed = time.perf_counter() - t0
        self._health_check(year, means)
        # Same land-only slice as _health_check: padding lanes carry real
        # (cell-0) forcing and would otherwise report phantom residuals.
        res_land = means["max_abs_residual"][:self._local_land_count()]
        max_res = float(np.max(res_land)) if res_land.size else 0.0
        log.info("year %d: %d days in %.2fs (%.0f cell-days/s), "
                 "max|residual|=%.3g mm", year, ndays, elapsed,
                 self.n * ndays / elapsed, max_res)
        self.annual_results.append(means)
        return means

    def _local_land_count(self) -> int:
        """Number of real (non-padding) cells in this host's means slab.

        Padding lanes sit at the top of the packed axis, i.e. inside the
        LAST host's slab under the contiguous 1-D decomposition.
        """
        if self.n_land is None:
            return self.host_hi - self.host_lo
        return int(np.clip(self.n_land - self.host_lo, 0,
                           self.host_hi - self.host_lo))

    def _health_check(self, year: int, means: Dict[str, np.ndarray]
                      ) -> None:
        """Failure detection: NaN state or broken water balance.

        The reference aborts the whole MPI job with the offending cell's
        coordinates (HYDROLOGY.f90:1244-1274); we log the worst cells
        with their packed indices and keep running — callers can treat a
        logged error as fatal if they choose.
        """
        res = means["max_abs_residual"]
        res = res[:self._local_land_count()]   # padding carries no state
        bad_nan = ~np.isfinite(res)
        if np.any(bad_nan):
            idx = np.flatnonzero(bad_nan)[:8]
            log.error("year %d: NON-FINITE state in %d cells (packed "
                      "idx %s)", year, int(bad_nan.sum()), idx.tolist())
        worst = np.nanmax(res) if res.size else 0.0
        if worst > 1.0:
            i = int(np.nanargmax(res))
            log.error("year %d: water-balance residual %.3g mm >> 0.1 mm "
                      "at packed cell %d", year, float(worst), i)
        elif worst > 0.1:
            # Isolated f32 exceedances of the reference's 0.1 mm abort
            # threshold occur at "problem point" cells exactly as in the
            # reference (driver.txt:34-59); see DEVIATIONS.md.
            i = int(np.nanargmax(res))
            log.warning("year %d: water-balance residual %.3g mm > "
                        "0.1 mm at packed cell %d", year, float(worst), i)

    def run(self, forcing_provider, writer=None,
            checkpointer=None) -> List[Dict[str, np.ndarray]]:
        """Run [start_year, end_year], optionally writing annual files.

        The output pass matches the reference's axy<year>.nc writes
        (HYBRID9.f90:492-519) but streams per year instead of buffering
        the whole run.
        """
        cfg = self.cfg
        for year in range(cfg.start_year, cfg.end_year + 1):
            means = self.run_year(year, forcing_provider)
            if writer is not None:
                writer.write_annual(year, means)
            if (checkpointer is not None and cfg.checkpoint_every_years
                    and (year - cfg.start_year + 1)
                    % cfg.checkpoint_every_years == 0):
                checkpointer.save(year, self.state)
        if checkpointer is not None:
            # Asynchronous saves must land before interpreter teardown.
            checkpointer.wait()
        if self.focus_writer is not None:
            self.focus_writer.close()
            self.focus_writer = None
        return self.annual_results
