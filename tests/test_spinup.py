"""Carbon/vegetation equilibrium spin-up (spinup.py) and the
conservative NEE definition it depends on (DEVIATIONS.md #4).

The reference has no carbon pools and no spin-up utility (its spin-up
was a manual repeat-run loop in LCLIM site mode, HYBRID9.f90:341); both
are new subsystems, so these tests pin their defining properties:
exact ecosystem carbon balance, the linear-pool fixed point of the
ratio jump, and convergence of the repeat-climate loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hybrid9_tpu.calendar as cal
from hybrid9_tpu.config import Config
from hybrid9_tpu.data.forcing import SyntheticForcingProvider
from hybrid9_tpu.data.soil import load_soil
from hybrid9_tpu.physics.carbon import C_PER_DM
from hybrid9_tpu.run import Simulation
from hybrid9_tpu.spinup import _DIAG_KEY, _ratio_update, _spinup_block, \
    spinup_carbon


def _small_sim(**over):
    kw = dict(resolution_deg=24.0, start_year=1901, end_year=1901,
              forcing_block_days=92, cell_block=16, nisurf=4,
              use_pallas=False, carbon=True)
    kw.update(over)
    cfg = Config(**kw)
    grid, params = load_soil(cfg)
    provider = SyntheticForcingProvider(grid.n_padded, seed=3,
                                        lat=grid.cell_lat)
    return cfg, grid, params, provider


def _rehearse(sim, provider, cfg, year=1901):
    """One plain rehearsal year (no jump): (end_state, flux sums)."""
    sums = {k: jnp.zeros((sim.n,), sim.dtype) for k in _DIAG_KEY}
    state, doy, nd = sim.state, 1, cal.days_in_year(year)
    while doy <= nd:
        nblk = min(cfg.forcing_block_days, nd - doy + 1)
        state, sums = _spinup_block(state, sums,
                                    provider(year, doy, nblk),
                                    sim.params, sim.geom, cfg.dt,
                                    cfg.nisurf, **sim.step_kwargs())
        doy += nblk
    return state, sums


def test_ecosystem_carbon_balance():
    """NEE == -d(total ecosystem C)/dt exactly (plant + foliage +
    litter + fast + slow), which the npp-based definition violated."""
    cfg, grid, params, provider = _small_sim()
    sim = Simulation(cfg, params, land_grid=grid)

    def total_c(state):
        return (C_PER_DM * (state.veg.plant_mass
                            + state.veg.plant_foliage_mass)
                + state.carbon.c_litter + state.carbon.c_soil_fast
                + state.carbon.c_soil_slow)

    c0 = np.asarray(total_c(sim.state), np.float64)
    state, sums = _rehearse(sim, provider, cfg)
    c1 = np.asarray(total_c(state), np.float64)
    nee = np.asarray(sums["nee"], np.float64)
    # f32 accumulation over 365 days of ~kg-scale pools: allow ~1e-3
    # relative slack.
    np.testing.assert_allclose(c1 - c0, -nee,
                               rtol=2.0e-3, atol=2.0e-2)


def test_ratio_jump_linear_fixed_point():
    """On pools with inflow = 2x outflow, the undamped jump doubles the
    pool; with balanced fluxes it is the identity."""
    cfg, grid, params, provider = _small_sim()
    sim = Simulation(cfg, params, land_grid=grid)
    n = sim.n
    one = jnp.ones((n,), sim.dtype)
    sums = {k: one for k in _DIAG_KEY}
    sums = dict(sums, lit_in=2.0 * one, d_lit=one)
    st = _ratio_update(sim.state, sums, spin_vegetation=False)
    np.testing.assert_allclose(np.asarray(st.carbon.c_litter),
                               2.0 * np.asarray(sim.state.carbon.c_litter),
                               rtol=1e-6)
    # fast: inflow TO_FAST*lit_in = 0.7, outflow 1 -> shrinks by 0.7.
    np.testing.assert_allclose(
        np.asarray(st.carbon.c_soil_fast),
        0.7 * np.asarray(sim.state.carbon.c_soil_fast), rtol=1e-6)
    # Zero-flux cells are untouched (degenerate steady state).
    z = jnp.zeros((n,), sim.dtype)
    sums0 = {k: z for k in _DIAG_KEY}
    st0 = _ratio_update(sim.state, sums0, spin_vegetation=False)
    np.testing.assert_array_equal(np.asarray(st0.carbon.c_soil_slow),
                                  np.asarray(sim.state.carbon.c_soil_slow))


def test_spinup_converges_to_equilibrium():
    """VERDICT r2 item 7's acceptance: after --spinup-carbon, the slow
    pool drifts below threshold per repeated-climate year and annual
    NEE is ~0 (within 2% of annual production)."""
    cfg, grid, params, provider = _small_sim()
    sim = Simulation(cfg, params, land_grid=grid)
    report = spinup_carbon(sim, provider, max_loops=14, tol_slow=0.5)
    assert report["loops"] <= 14
    assert report["max_dslow"] < 0.5          # converged within budget
    # Pools moved off the cold-start values toward equilibrium.
    assert report["mean_slow"] > 2.0 * 5000.0
    # Verification year WITHOUT jumps: near-periodic carbon state.
    state, sums = _rehearse(sim, provider, cfg)
    dslow = np.abs(np.asarray(state.carbon.c_soil_slow
                              - sim.state.carbon.c_soil_slow))
    n_land = grid.n_land
    assert float(dslow[:n_land].max()) < 2.0   # g C/m^2/yr
    nee = float(np.mean(np.asarray(sums["nee"])[:n_land]))
    prod_c = C_PER_DM * float(np.mean(
        np.asarray(sums["grow_pm"] + sums["grow_fm"])[:n_land]))
    assert prod_c > 0.0
    assert abs(nee) / prod_c < 0.02


def test_spinup_requires_carbon():
    cfg, grid, params, provider = _small_sim(carbon=False)
    sim = Simulation(cfg, params, land_grid=grid)
    with pytest.raises(ValueError, match="carbon"):
        spinup_carbon(sim, provider)


def test_spinup_cli_flag(tmp_path):
    """--spinup-carbon through the CLI on a tiny run."""
    import json

    from hybrid9_tpu.cli import main
    cfgp = tmp_path / "cfg.json"
    out = tmp_path / "out"
    out.mkdir()
    cfg = Config(resolution_deg=24.0, start_year=1901, end_year=1901,
                 forcing_block_days=92, cell_block=16, nisurf=4,
                 use_pallas=False, carbon=True,
                 output_path=str(out), checkpoint_every_years=0)
    cfgp.write_text(cfg.to_json())
    rc = main(["run", "--config", str(cfgp), "--spinup-carbon", "3",
               "--spinup-tol", "5.0"])
    assert rc == 0
