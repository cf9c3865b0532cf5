"""End-to-end Simulation driver on CPU: multi-year run with routing,
annual NetCDF output, prefetch, health check, checkpoint cycle."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid9_tpu.config import Config
from hybrid9_tpu.data.forcing import (PrefetchingProvider,
                                      SyntheticForcingProvider)
from hybrid9_tpu.data.soil import load_soil
from hybrid9_tpu.io.writer import AnnualWriter, write_init_diagnostics
from hybrid9_tpu.run import Simulation


@pytest.fixture(scope="module")
def small_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1902,
                 forcing_block_days=30, cell_block=32, nisurf=8,
                 output_path=out, use_pallas=False)
    grid, params = load_soil(cfg)
    provider = PrefetchingProvider(SyntheticForcingProvider(
        grid.n_padded, seed=9, lat=grid.cell_lat, dtype=jnp.float32))
    sim = Simulation(cfg, params, land_grid=grid)
    writer = AnnualWriter(out, grid)
    results = sim.run(provider, writer=writer)
    provider.close()
    return cfg, grid, sim, results


def test_two_year_run_completes(small_run):
    cfg, grid, sim, results = small_run
    assert len(results) == 2
    assert sim.routing is not None          # lateral routing active
    for m in results:
        assert float(np.max(m["max_abs_residual"])) < 0.1
        assert np.all(np.isfinite(m["theta"]))


def test_annual_files_written(small_run):
    cfg, grid, sim, results = small_run
    from hybrid9_tpu.io import netcdf
    for year in (1901, 1902):
        path = os.path.join(cfg.output_path, f"axy{year}.nc")
        assert os.path.exists(path)
        back = netcdf.read_grid_file(path, ["tas", "npp", "discharge"])
        land = ~np.isnan(back["tas"])
        assert land.sum() == grid.n_land
        assert 200.0 < np.nanmean(back["tas"]) < 320.0


def test_routing_water_appears(small_run):
    cfg, grid, sim, results = small_run
    # Some runoff must have been routed into the river network.
    store = np.asarray(sim.state.river_store)
    assert np.all(np.isfinite(store))
    assert float(store.sum()) > 0.0
    # And some discharged to the ocean over the year.
    assert float(np.nansum(results[-1]["discharge"])) > 0.0


def test_init_diagnostics_file(small_run, tmp_path):
    cfg, grid, sim, results = small_run
    path = write_init_diagnostics(str(tmp_path), grid, sim.params,
                                  n_shards=4)
    from hybrid9_tpu.io import netcdf
    back = netcdf.read_grid_file(path, ["psi_s", "land_mask",
                                        "shard_map"])
    assert back["psi_s"].shape[-1] == 8
    assert np.nansum(back["land_mask"]) == grid.n_land


def test_checkpoint_cycle(small_run, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from hybrid9_tpu.io.checkpoint import Checkpointer
    cfg, grid, sim, results = small_run
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(1902, sim.state)
    ckpt.wait()
    year, restored = ckpt.restore(sim.state)
    assert year == 1902
    np.testing.assert_array_equal(np.asarray(restored.river_store),
                                  np.asarray(sim.state.river_store))
    ckpt.close()


def test_one_year_kinematic_routing(tmp_path):
    """Simulation with routing_scheme='kinematic' runs and discharges."""
    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=30, cell_block=32, nisurf=8,
                 output_path=str(tmp_path), use_pallas=False,
                 routing_scheme="kinematic", routing_substeps=4)
    grid, params = load_soil(cfg)
    provider = SyntheticForcingProvider(
        grid.n_padded, seed=9, lat=grid.cell_lat, dtype=jnp.float32)
    sim = Simulation(cfg, params, land_grid=grid)
    from hybrid9_tpu.physics.routing import (GridKinematicParams,
                                             GridRouting)
    # routing_form="auto" resolves kinematic to the dense roll form.
    assert isinstance(sim.routing, GridRouting)
    assert isinstance(sim.routing.params, GridKinematicParams)
    results = sim.run(provider)
    assert float(np.max(results[0]["max_abs_residual"])) < 0.1
    assert float(np.sum(results[0]["discharge"])) > 0.0


def test_interactive_focus_csv(tmp_path):
    """INTERACTIVE mode writes a daily CSV for the focus cell
    (reference: HYBRID9.f90:221-229, INIT.f90:887-891)."""
    import csv

    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=100, cell_block=32, nisurf=8,
                 output_path=str(tmp_path), use_pallas=False,
                 interactive=True, site_lon=-120.95, site_lat=38.41)
    grid, params = load_soil(cfg)
    provider = SyntheticForcingProvider(
        grid.n_padded, seed=9, lat=grid.cell_lat, dtype=jnp.float32)
    sim = Simulation(cfg, params, land_grid=grid)
    assert sim.focus_idx is not None
    sim.run(provider)
    path = os.path.join(str(tmp_path), "focus_daily.csv")
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 365
    assert rows[0]["doy"] == "1" and rows[-1]["doy"] == "365"
    tas = np.array([float(r["tas"]) for r in rows])
    zwt = np.array([float(r["zwt"]) for r in rows])
    assert np.all((tas > 200.0) & (tas < 330.0))
    assert np.all((zwt >= 0.0) & (zwt <= 80.0))
    assert np.all(np.isfinite([float(r["theta_mean"]) for r in rows]))


def test_hot_climate_stability():
    """Hot-cell regression (DEVIATIONS.md #9): daily means above 39 C
    made the unclamped growth response drive plant mass negative and
    blow up the root profile / soil-water solve.  Two simulated years
    of 45 C, rainy forcing must stay finite and conservative."""
    import __graft_entry__ as ge
    from hybrid9_tpu.physics import constants as c
    from hybrid9_tpu.step import day_step

    step_fn, state, forcing, params, geom, cfg = ge._build(64)
    hot = forcing.replace(tas=jnp.full(64, 318.0),
                          pr=jnp.full(64, 3.0e-4))
    import jax
    day = jax.jit(lambda s: day_step(s, hot, params, geom, cfg.dt,
                                     cfg.nisurf))
    for _ in range(730):
        state, diags = day(state)
    assert np.all(np.isfinite(np.asarray(state.soil.h2osoi_liq)))
    assert np.all(np.asarray(state.veg.plant_mass) > 0.0)
    assert np.all(np.asarray(state.veg.rdepth) > 0.0)
    assert float(jnp.max(diags["max_abs_residual"])) < 0.1


def test_hydrology_only_mode(tmp_path):
    """BASELINE.json config 2: global hydrology-only run — vegetation
    stays at its prescribed initial state, water physics still runs and
    conserves."""
    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=60, cell_block=32, nisurf=8,
                 output_path=str(tmp_path), use_pallas=False,
                 vegetation=False)
    grid, params = load_soil(cfg)
    provider = SyntheticForcingProvider(
        grid.n_padded, seed=9, lat=grid.cell_lat, dtype=jnp.float32)
    sim = Simulation(cfg, params, land_grid=grid)
    veg0 = sim.state.veg
    results = sim.run(provider)
    assert float(np.max(results[0]["max_abs_residual"])) < 0.1
    np.testing.assert_array_equal(np.asarray(sim.state.veg.lai),
                                  np.asarray(veg0.lai))
    np.testing.assert_array_equal(np.asarray(sim.state.veg.plant_mass),
                                  np.asarray(veg0.plant_mass))
    assert float(np.max(results[0]["npp"])) == 0.0
    # Water still moved.
    assert float(np.sum(results[0]["evap"])) > 0.0


def test_donated_block_step_matches(tmp_path):
    """Config.donate_state reuses state/acc buffers; results must be
    identical to the copying path (the knob exists because the axon TPU
    backend rejects D2H from donated executables — step.py note)."""
    def one_year(donate):
        cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                     forcing_block_days=60, cell_block=32, nisurf=8,
                     output_path=str(tmp_path), use_pallas=False,
                     donate_state=donate, write_annual=False)
        grid, params = load_soil(cfg)
        provider = SyntheticForcingProvider(
            grid.n_padded, seed=9, lat=grid.cell_lat, dtype=jnp.float32)
        sim = Simulation(cfg, params, land_grid=grid)
        return sim.run(provider)[0]

    plain = one_year(False)
    donated = one_year(True)
    for k in ("evap", "rnf", "theta", "npp"):
        np.testing.assert_array_equal(np.asarray(plain[k]),
                                      np.asarray(donated[k]))


def test_interactive_focus_wt_on_pallas_path(tmp_path):
    """VERDICT r3 item 5 (done criterion): under use_pallas the
    INTERACTIVE run still writes the per-substep focus water-table
    trace focus_wt.csv with the same columns as the XLA path (the
    reference's unit-98 artifact, HYDROLOGY.f90:509) — via the
    one-cell XLA shadow scan in day_step's Pallas branch."""
    import csv

    def run(use_pallas, out):
        cfg = Config(resolution_deg=12.0, start_year=1901,
                     end_year=1901, forcing_block_days=30,
                     cell_block=32, nisurf=4, output_path=str(out),
                     use_pallas=use_pallas, pallas_block=32,
                     pallas_interpret=use_pallas, interactive=True,
                     site_lon=-120.95, site_lat=38.41)
        grid, params = load_soil(cfg)
        provider = SyntheticForcingProvider(
            grid.n_padded, seed=9, lat=grid.cell_lat,
            dtype=jnp.float32)
        sim = Simulation(cfg, params, land_grid=grid)
        sim.run_year(1901, provider, block_days=30)
        if sim.focus_writer is not None:
            sim.focus_writer.close()
        with open(os.path.join(str(out), "focus_wt.csv")) as fh:
            return list(csv.DictReader(fh))

    rows_x = run(False, tmp_path / "xla")
    rows_p = run(True, tmp_path / "pal")
    assert rows_p[0].keys() == rows_x[0].keys()      # identical columns
    assert len(rows_p) == len(rows_x) == 365 * 4     # row per substep
    zx = np.array([float(r["zwt"]) for r in rows_x])
    zp = np.array([float(r["zwt"]) for r in rows_p])
    assert np.all(np.isfinite(zp))
    # The shadow replays the XLA math on the Pallas branch's day-start
    # state; over one block the traces stay close (Pallas-vs-XLA
    # parity tolerance accumulates slowly).
    np.testing.assert_allclose(zp, zx, rtol=5e-3, atol=5e-3)
