"""Soil-carbon cascade (physics/carbon.py): conservation, response
shapes, day_step/Simulation integration.

New subsystem beyond the reference: HYBRID9's carbon cycle stops at the
plant pool (labile C/N/P are dead code, SURVEY.md C15); this adds
litter + fast/slow SOM pools, Q10/moisture-modified decomposition,
heterotrophic respiration and NEE.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.carbon import (C_PER_DM, carbon_daily,
                                        decomposition_modifiers)
from hybrid9_tpu.state import CarbonState


def _carbon(n=4, dtype=jnp.float64):
    return CarbonState(
        c_litter=jnp.full((n,), 200.0, dtype),
        c_soil_fast=jnp.full((n,), 1500.0, dtype),
        c_soil_slow=jnp.full((n,), 6000.0, dtype))


def _cols(n=4, t_c=15.0, wet=0.5, nl=8):
    t = jnp.full((n, nl), c.TF + t_c)
    theta_s = jnp.full((n, nl), 0.45)
    theta = theta_s * wet
    return t, theta, theta_s


def test_carbon_conservation():
    """d(litter + fast + slow) == litterfall_C - rh, exactly."""
    rng = np.random.RandomState(7)
    n = 256
    cs = CarbonState(c_litter=jnp.asarray(rng.rand(n) * 500.0),
                     c_soil_fast=jnp.asarray(rng.rand(n) * 3000.0),
                     c_soil_slow=jnp.asarray(rng.rand(n) * 10000.0))
    npp = jnp.asarray(rng.rand(n) * 5.0)
    lf = jnp.asarray(rng.rand(n) * 3.0)
    t = jnp.asarray(c.TF - 20.0 + rng.rand(n, 8) * 60.0)
    ts = jnp.full((n, 8), 0.45)
    th = ts * jnp.asarray(rng.rand(n, 8))
    new, rh, nee = jax.jit(carbon_daily)(cs, npp, lf, t, th, ts)
    tot0 = np.asarray(cs.c_litter + cs.c_soil_fast + cs.c_soil_slow)
    tot1 = np.asarray(new.c_litter + new.c_soil_fast + new.c_soil_slow)
    np.testing.assert_allclose(tot1 - tot0,
                               C_PER_DM * np.asarray(lf) - np.asarray(rh),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(nee),
                               np.asarray(rh) - C_PER_DM * np.asarray(npp),
                               rtol=1e-12)
    for f in (new.c_litter, new.c_soil_fast, new.c_soil_slow):
        assert np.all(np.asarray(f) >= 0.0)


def test_modifier_shapes():
    """Q10 doubling per 10 C; moisture optimum near 0.6 saturation."""
    t_cold, th, ts = _cols(t_c=5.0)
    t_warm, _, _ = _cols(t_c=15.0)
    ft_cold, _ = decomposition_modifiers(t_cold, th, ts)
    ft_warm, _ = decomposition_modifiers(t_warm, th, ts)
    np.testing.assert_allclose(np.asarray(ft_warm / ft_cold), 2.0,
                               rtol=1e-6)
    t, th_dry, ts = _cols(wet=0.02)
    _, fw_dry = decomposition_modifiers(t, th_dry, ts)
    _, fw_opt = decomposition_modifiers(t, ts * 0.6, ts)
    _, fw_sat = decomposition_modifiers(t, ts, ts)
    assert float(fw_dry[0]) == 0.0
    np.testing.assert_allclose(float(fw_opt[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(fw_sat[0]), 0.6, rtol=1e-6)


def test_warm_wet_respires_faster():
    cs = _carbon()
    npp = jnp.zeros(4)
    lf = jnp.zeros(4)
    _, rh_warm, _ = carbon_daily(cs, npp, lf, *_cols(t_c=25.0, wet=0.6))
    _, rh_cold, _ = carbon_daily(cs, npp, lf, *_cols(t_c=-5.0, wet=0.6))
    # 30 C of Q10=2 is exactly 2^3 = 8x (fluxes scale linearly in mod).
    np.testing.assert_allclose(float(rh_warm[0]),
                               8.0 * float(rh_cold[0]), rtol=1e-9)
    # Positive NPP with zero litter input makes the cell a sink.
    _, _, nee = carbon_daily(cs, jnp.full(4, 10.0), lf,
                             *_cols(t_c=5.0, wet=0.3))
    assert float(nee[0]) < 0.0


def test_day_step_carbon_integration(layer_grid):
    """day_step(carbon=True) evolves the pools and reports rh/nee;
    carbon=False leaves the pools untouched with zero fluxes."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(128)
    st_on, d_on = day_step(state, forcing, params, geom, cfg.dt,
                           cfg.nisurf, carbon=True)
    st_off, d_off = day_step(state, forcing, params, geom, cfg.dt,
                             cfg.nisurf, carbon=False)
    assert float(jnp.max(jnp.abs(d_on["rh"]))) > 0.0
    assert "nee" in d_on
    np.testing.assert_array_equal(np.asarray(d_off["rh"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(st_off.carbon.c_litter),
        np.asarray(state.carbon.c_litter))
    # Litterfall flowed into the litter pool net of decomposition:
    # pools changed.
    assert not np.allclose(np.asarray(st_on.carbon.c_litter),
                           np.asarray(state.carbon.c_litter))
    assert float(jnp.max(d_on["max_abs_residual"])) < 0.1


def test_simulation_year_with_carbon(tmp_path):
    """A short coupled year with carbon on: annual means carry rh/nee/
    c_soil and the written file includes them."""
    import os

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.io import netcdf
    from hybrid9_tpu.io.writer import AnnualWriter
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=60, cell_block=32, nisurf=4,
                 use_pallas=False, output_path=str(tmp_path))
    grid, params = load_soil(cfg)
    provider = SyntheticForcingProvider(grid.n_padded, seed=5,
                                        lat=grid.cell_lat)
    sim = Simulation(cfg, params, land_grid=grid)
    means = sim.run_year(1901, provider)
    writer = AnnualWriter(str(tmp_path), grid)
    writer.write_annual(1901, means)
    land = slice(0, grid.n_land)
    assert np.all(np.isfinite(means["rh"][land]))
    assert float(np.max(means["rh"][land])) > 0.0
    assert np.all(means["c_soil"][land] > 0.0)
    back = netcdf.read_grid_file(
        os.path.join(str(tmp_path), "axy1901.nc"),
        ["rh", "nee", "c_soil"])
    assert np.nanmax(back["rh"]) > 0.0
