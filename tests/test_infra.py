"""Infrastructure tests: calendar, config, grid pack/scatter, NetCDF I/O,
forcing providers, checkpointing."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid9_tpu import calendar
from hybrid9_tpu.config import Config, LayerGrid
from hybrid9_tpu.data.forcing import (PrefetchingProvider,
                                      SyntheticForcingProvider)
from hybrid9_tpu.grids.grid import (cell_centres, make_land_grid,
                                    synthetic_land_mask)
from hybrid9_tpu.io import netcdf


def test_calendar_matches_reference_construction():
    """time_BOY table: 1-based, leap-aware (INIT.f90:844-859)."""
    table = calendar.time_boy_table()
    assert table[0] == 1
    # 1860 is a leap year (div by 4, not century).
    assert table[1] - table[0] == 366
    # Climate input 1901 starts at day 14976 in the reference's 1-based
    # numbering (INIT.f90 comment: "Climate input 1901 starts Time =
    # 14975", 0-based).
    assert calendar.time_boy(1901) == 14976
    # 1900 is NOT a leap year (century, not div 400).
    assert calendar.time_boy(1901) - calendar.time_boy(1900) == 365
    # 2000 IS a leap year.
    assert calendar.time_boy(2001) - calendar.time_boy(2000) == 366


def test_decade_spans():
    assert calendar.decade_year_span(1) == (1901, 1910)
    assert calendar.decade_year_span(11) == (2001, 2010)
    assert calendar.decade_year_span(12) == (2011, 2012)
    assert calendar.decade_of_year(1901) == 1
    assert calendar.decade_of_year(2012) == 12


def test_layer_grid_canonical():
    """dz/zc derivation matches INIT.f90:252-263 on driver.txt depths."""
    g = LayerGrid.from_interfaces()
    assert g.nlevgrnd == 9
    assert g.nsoil == 8
    np.testing.assert_allclose(g.dz[0], 45.0)
    np.testing.assert_allclose(g.zc[0], 22.5)
    np.testing.assert_allclose(g.dz[8], 5000.0 - 2296.0)
    np.testing.assert_allclose(g.zc[3], 289.0 - (289.0 - 166.0) / 2.0)


def test_config_roundtrip():
    cfg = Config(nisurf=24, resolution_deg=0.25, dtype="float64")
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert cfg.dt == 3600.0
    assert cfg.nx == 1440 and cfg.ny == 720


def test_grid_pack_scatter_roundtrip():
    mask = synthetic_land_mask(resolution_deg=4.0, seed=1)
    grid = make_land_grid(mask, 4.0, pad_multiple=64)
    assert grid.n_land == mask.sum()
    assert grid.n_padded % 64 == 0
    field = np.arange(mask.size, dtype=np.float64).reshape(mask.shape)
    packed = grid.pack(field)
    assert packed.shape == (grid.n_padded,)
    back = grid.scatter(packed)
    np.testing.assert_array_equal(back[mask], field[mask])
    assert np.all(np.isnan(back[~mask]))
    # 3-D fields (layers) roundtrip too.
    f3 = np.stack([field, field * 2], axis=-1)
    p3 = grid.pack(f3)
    b3 = grid.scatter(p3)
    np.testing.assert_array_equal(b3[mask], f3[mask])


def test_grid_cell_lookup():
    mask = synthetic_land_mask(resolution_deg=4.0, seed=1)
    grid = make_land_grid(mask, 4.0, pad_multiple=64)
    i = grid.cell_index_of(-120.95, 38.41)
    assert 0 <= i < grid.n_land
    # It must be the nearest land cell (synthetic continents need not
    # have land at the exact site), under the wrap + cos(lat) metric.
    dlon = (grid.cell_lon[:grid.n_land] + 120.95 + 180.0) % 360.0 - 180.0
    d2 = (dlon * np.cos(np.deg2rad(38.41))) ** 2 \
        + (grid.cell_lat[:grid.n_land] - 38.41) ** 2
    assert i == int(np.argmin(d2))


def test_grid_cell_lookup_dateline():
    """A focus point just west of the dateline must resolve to a cell
    just east of it (longitude wrap), not to the far side of the map."""
    mask = np.zeros((45, 90), dtype=bool)   # 4-degree grid
    # Land only in the first and last longitude columns near the equator.
    mask[20:25, 0] = True     # lon = -178
    mask[20:25, 45] = True    # lon = +2 (map middle)
    grid = make_land_grid(mask, 4.0, pad_multiple=16)
    i = grid.cell_index_of(179.8, 0.0)
    # Nearest by wrapped distance is lon -178 (2.2 deg away), not +2.
    assert grid.cell_lon[i] == -178.0


def test_cell_centres():
    lon, lat = cell_centres(0.5)
    assert lon.shape == (720,) and lat.shape == (360,)
    assert lon[0] == -179.75 and lat[0] == 89.75
    assert lon[-1] == 179.75 and lat[-1] == -89.75


def test_netcdf_roundtrip(tmp_path):
    """write_grid_file / read_grid_file roundtrip incl. fill values."""
    lon, lat = cell_centres(4.0)
    ny, nx = lat.shape[0], lon.shape[0]
    rng = np.random.RandomState(0)
    f2 = rng.uniform(0.0, 300.0, (ny, nx))
    f2[0, :] = np.nan  # ocean row
    f3 = rng.uniform(0.0, 0.5, (ny, nx, 8))
    path = str(tmp_path / "test.nc")
    netcdf.write_grid_file(path, {"tas": f2, "theta": f3}, lon, lat,
                           units={"tas": "K"}, layer_dim=8)
    back = netcdf.read_grid_file(path, ["tas", "theta"])
    np.testing.assert_allclose(back["tas"][1:], f2[1:], rtol=1e-6)
    assert np.all(np.isnan(back["tas"][0]))
    np.testing.assert_allclose(back["theta"], f3, rtol=1e-6)
    # Raw hyperslab read path.
    sl = netcdf.read_variable(path, "tas", (slice(0, 3),))
    assert sl.shape[0] == 3


def test_synthetic_forcing_provider_prefetch():
    base = SyntheticForcingProvider(32, seed=5, dtype=jnp.float64)
    pre = PrefetchingProvider(base)
    pre.prefetch(1901, 1, 10)
    f = pre(1901, 1, 10)
    assert f.tas.shape == (10, 32)
    # Deterministic: same request -> same data.
    f2 = base(1901, 1, 10)
    np.testing.assert_array_equal(np.asarray(f.tas), np.asarray(f2.tas))
    # Different year -> different data.
    f3 = base(1902, 1, 10)
    assert not np.array_equal(np.asarray(f.tas), np.asarray(f3.tas))
    pre.close()


def test_checkpoint_roundtrip(tmp_path, layer_grid):
    """Orbax save/restore of the full ModelState pytree."""
    pytest.importorskip("orbax.checkpoint")
    from hybrid9_tpu.data.synthetic import synthetic_soil_params
    from hybrid9_tpu.io.checkpoint import Checkpointer
    from hybrid9_tpu.state import SoilParams, initial_state

    raw = synthetic_soil_params(16, seed=0)
    params = SoilParams(**{k: jnp.asarray(v, jnp.float32)
                           for k, v in raw.items()})
    state = initial_state(params, layer_grid.dz, layer_grid.zi,
                          jnp.float32)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(1905, state)
    ckpt.wait()
    assert ckpt.latest_year() == 1905
    year, restored = ckpt.restore(state)
    assert year == 1905
    np.testing.assert_array_equal(np.asarray(restored.soil.h2osoi_liq),
                                  np.asarray(state.soil.h2osoi_liq))
    np.testing.assert_array_equal(np.asarray(restored.veg.lai),
                                  np.asarray(state.veg.lai))
    ckpt.close()


def test_checkpoint_roundtrip_float64(tmp_path, layer_grid):
    """A float64 run must restore as float64 (the resume-template dtype
    path in cli.py passes the configured dtype)."""
    pytest.importorskip("orbax.checkpoint")
    from hybrid9_tpu.data.synthetic import synthetic_soil_params
    from hybrid9_tpu.io.checkpoint import Checkpointer
    from hybrid9_tpu.state import SoilParams, initial_state

    raw = synthetic_soil_params(16, seed=0)
    params = SoilParams(**{k: jnp.asarray(v, jnp.float64)
                           for k, v in raw.items()})
    state = initial_state(params, layer_grid.dz, layer_grid.zi,
                          jnp.float64)
    ckpt = Checkpointer(str(tmp_path / "ckpt64"))
    ckpt.save(1903, state)
    ckpt.wait()
    template = initial_state(params, layer_grid.dz, layer_grid.zi,
                             jnp.float64)
    year, restored = ckpt.restore(template)
    assert year == 1903
    assert restored.soil.h2osoi_liq.dtype == jnp.float64
    np.testing.assert_array_equal(np.asarray(restored.soil.h2osoi_liq),
                                  np.asarray(state.soil.h2osoi_liq))
    ckpt.close()


def test_checkpoint_schema_migration(tmp_path, layer_grid):
    """Restoring a checkpoint written before a state-schema extension
    zero-fills the missing fields instead of failing (the swe /
    h2osoi_ice addition broke old checkpoints in round 1)."""
    ocp = pytest.importorskip("orbax.checkpoint")
    import dataclasses

    from hybrid9_tpu.data.synthetic import synthetic_soil_params
    from hybrid9_tpu.io.checkpoint import Checkpointer
    from hybrid9_tpu.state import SoilParams, initial_state

    raw = synthetic_soil_params(16, seed=0)
    params = SoilParams(**{k: jnp.asarray(v, jnp.float32)
                           for k, v in raw.items()})
    state = initial_state(params, layer_grid.dz, layer_grid.zi,
                          jnp.float32)
    # Simulate an "old" checkpoint: the saved tree lacks swe/h2osoi_ice
    # (round-1 additions) and the two-layer snowpack (round-2 addition).
    old_tree = dataclasses.asdict(state)
    old_tree.pop("swe")
    old_tree.pop("h2osoi_ice")
    old_tree.pop("snowpack")
    ckpt = Checkpointer(str(tmp_path / "ckpt_old"))
    ckpt.manager.save(1904, args=ocp.args.StandardSave(old_tree))
    ckpt.wait()
    year, restored = ckpt.restore(state)
    assert year == 1904
    np.testing.assert_array_equal(np.asarray(restored.soil.h2osoi_liq),
                                  np.asarray(state.soil.h2osoi_liq))
    # Missing fields come back zero-filled with the template's shape.
    assert restored.swe.shape == state.swe.shape
    np.testing.assert_array_equal(np.asarray(restored.swe), 0.0)
    np.testing.assert_array_equal(np.asarray(restored.h2osoi_ice), 0.0)
    assert restored.snowpack.swe_surf.shape == state.swe.shape
    np.testing.assert_array_equal(np.asarray(restored.snowpack.w_liq),
                                  0.0)
    # Missing fields take the TEMPLATE's physical defaults, not zeros:
    # pack temperatures restore at freezing, not 0 K.
    from hybrid9_tpu.physics import constants as c
    np.testing.assert_allclose(np.asarray(restored.snowpack.t_surf),
                               c.TF, rtol=1e-6)
    ckpt.close()


def test_quarter_degree_grid():
    """BASELINE config 5 geometry: 0.25-degree global grid."""
    from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask
    mask = synthetic_land_mask(resolution_deg=0.25, seed=0)
    assert mask.shape == (720, 1440)
    grid = make_land_grid(mask, 0.25, pad_multiple=1024)
    # ~29 % land of ~1M cells.
    assert 250_000 < grid.n_land < 330_000
    assert grid.n_padded % 1024 == 0
    lon, lat = grid.lon, grid.lat
    assert lon.shape == (1440,) and lat.shape == (720,)


def test_pgf_decade_path():
    from hybrid9_tpu.data.forcing import pgf_decade_path
    assert pgf_decade_path("/d", "tas", 1905) \
        == "/d/tas_pgfv2.1_1901_1910.nc4"
    assert pgf_decade_path("/d", "pr", 2011) \
        == "/d/pr_pgfv2.1_2011_2012.nc4"


def test_load_soil_from_netcdf(tmp_path):
    """C4 ingest path: preprocessed soil NetCDF -> LandGrid + SoilParams."""
    import jax.numpy as jnp
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.grids.grid import cell_centres

    rng = np.random.RandomState(0)
    lon, lat = cell_centres(12.0)
    ny, nx = lat.shape[0], lon.shape[0]
    soil_tex = rng.randint(0, 14, size=(ny, nx)).astype(np.float64)
    theta_s = rng.uniform(0.3, 0.5, (ny, nx, 8))
    hksat = rng.uniform(1e-4, 1e-2, (ny, nx, 8))
    lam = rng.uniform(0.1, 0.4, (ny, nx, 8))
    psi_s = -rng.uniform(100.0, 700.0, (ny, nx, 8))
    fmax = rng.uniform(0.1, 0.5, (ny, nx))
    fmax[0, 0] = np.nan    # missing -> reference default 0.3809
    path = str(tmp_path / "soil.nc")
    netcdf.write_grid_file(
        path,
        {"soil_tex": soil_tex, "theta_s": theta_s, "hksat": hksat,
         "lambda": lam, "psi_s": psi_s, "fmax": fmax},
        lon, lat, layer_dim=8)

    cfg = Config(resolution_deg=12.0, soil_source="netcdf",
                 soil_path=path, cell_block=32)
    grid, params = load_soil(cfg)
    expected_land = ((soil_tex > 0) & (soil_tex != 13)).sum()
    assert grid.n_land == expected_land
    assert params.theta_s.shape == (grid.n_padded, 8)
    # bsw = 1/lambda and the -31 bar residual are derived.
    np.testing.assert_allclose(
        np.asarray(params.bsw[:grid.n_land]),
        1.0 / np.asarray(params.lambda_[:grid.n_land]), rtol=1e-5)
    tm = np.asarray(params.theta_m[:grid.n_land])
    assert np.all((tm > 0.0) & (tm < np.asarray(
        params.theta_s[:grid.n_land])))


def test_device_forcing_provider():
    """On-device synthetic forcing: shapes, ranges, determinism."""
    from hybrid9_tpu.data.device_forcing import (
        DeviceSyntheticForcingProvider)
    p = DeviceSyntheticForcingProvider(48, seed=3)
    f1 = p(1901, 1, 5)
    f2 = p(1901, 1, 5)
    np.testing.assert_array_equal(np.asarray(f1.tas), np.asarray(f2.tas))
    f3 = p(1902, 1, 5)
    assert not np.array_equal(np.asarray(f1.tas), np.asarray(f3.tas))
    for k in ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs"):
        v = np.asarray(getattr(f1, k))
        assert v.shape == (5, 48)
        assert np.all(np.isfinite(v))
    assert np.asarray(f1.pr).min() >= 0.0


def test_site_lai_waypoints():
    """Prescribed-LAI phenology (Vaira analog, HYBRID9.f90:380-417):
    shed foliage moves to the litter layer."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.site import run_site
    cfg = Config(spinup_years=0, nisurf=8)
    waypoints = {1: 0.88, 59: 1.17, 122: 0.5, 136: 0.001}
    result = run_site(cfg, lai_waypoints=waypoints)
    daily = {r["doy"]: r for r in result.daily}
    # On shed days the litter layer gained the dropped LAI.
    assert daily[136]["lai_litter"] > daily[121]["lai_litter"] * 0.5
    assert abs(daily[59]["lai"] - daily[59]["lai"]) == 0.0
    worst = max(r["max_residual"] for r in result.daily)
    assert worst < 1e-6


def test_site_subdaily_overrides(tmp_path):
    """LCLIM-style sub-daily forcing overrides drive the column."""
    import csv as _csv
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.site import read_site_subdaily_csv, run_site

    nisurf = 8
    path = tmp_path / "subdaily.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["doy", "step", "rnet", "par", "ppt"])
        for step in range(1, nisurf + 1):
            # Day 5: strong radiation at midday steps, 2 mm rain each.
            rnet = 400.0 if 3 <= step <= 6 else -30.0
            w.writerow([5, step, rnet, max(0.0, rnet) * 2, 2.0])
    sub = read_site_subdaily_csv(str(path), nisurf)
    assert set(sub.keys()) == {5}
    assert sub[5][3]["rnet"] == 400.0
    assert abs(sub[5][0]["forc_rain"] - 2.0 / (86400 / nisurf)) < 1e-12

    cfg = Config(spinup_years=0, nisurf=nisurf)
    res_plain = run_site(cfg, grow=False)
    res_over = run_site(cfg, subdaily=sub, grow=False)
    d5p = next(r for r in res_plain.daily if r["doy"] == 5)
    d5o = next(r for r in res_over.daily if r["doy"] == 5)
    # 16 mm of prescribed rain must wet the surface layer vs baseline.
    assert d5o["theta1"] > d5p["theta1"]
    worst = max(r["max_residual"] for r in res_over.daily)
    assert worst < 1e-6


def test_checkpoint_schema_migration_sharded(tmp_path, layer_grid):
    """VERDICT r3 item 4: the SHARDED restore path must migrate schema
    too — an old checkpoint (missing fields, plus a since-removed
    field) restores cell-sharded over the 8-device mesh, missing fields
    template-filled, extra fields dropped."""
    ocp = pytest.importorskip("orbax.checkpoint")
    import dataclasses

    import jax

    from hybrid9_tpu.data.synthetic import synthetic_soil_params
    from hybrid9_tpu.io.checkpoint import Checkpointer
    from hybrid9_tpu.parallel.sharding import CellSharding
    from hybrid9_tpu.state import SoilParams, initial_state

    n = 32                                   # divisible by 8 devices
    raw = synthetic_soil_params(n, seed=0)
    params = SoilParams(**{k: jnp.asarray(v, jnp.float32)
                           for k, v in raw.items()})
    state = initial_state(params, layer_grid.dz, layer_grid.zi,
                          jnp.float32)
    old_tree = dataclasses.asdict(state)
    old_tree.pop("swe")
    old_tree.pop("snowpack")
    # A field the current schema no longer has (must be ignored, and
    # its odd length must not break the cell sharding).
    old_tree["legacy_counter"] = jnp.arange(3.0)
    ckpt = Checkpointer(str(tmp_path / "ckpt_old_sh"))
    ckpt.manager.save(1907, args=ocp.args.StandardSave(old_tree))
    ckpt.wait()

    sharding = CellSharding.create(jax.devices()[:8])
    year, restored = ckpt.restore(state, sharding=sharding)
    assert year == 1907
    # Present fields: values preserved, cell-sharded.
    np.testing.assert_array_equal(np.asarray(restored.soil.h2osoi_liq),
                                  np.asarray(state.soil.h2osoi_liq))
    assert restored.soil.h2osoi_liq.sharding.is_equivalent_to(
        sharding.spec_for(state.soil.h2osoi_liq),
        state.soil.h2osoi_liq.ndim)
    # Missing fields: template defaults, cell-sharded.
    np.testing.assert_array_equal(np.asarray(restored.swe), 0.0)
    assert restored.swe.sharding.is_equivalent_to(
        sharding.spec_for(state.swe), 1)
    from hybrid9_tpu.physics import constants as c
    np.testing.assert_allclose(np.asarray(restored.snowpack.t_surf),
                               c.TF, rtol=1e-6)
    assert not hasattr(restored, "legacy_counter")
    ckpt.close()
