"""ZD09 equilibrium-profile refresh interval (Config.zd09_every).

The Zeng & Decker (2009) equilibrium profile (HYDROLOGY.f90:512-590)
depends only on the water table and static soil parameters; recomputing
it costs ~26 of the substep's ~44 pow evaluations.  ``zd09_every > 1``
refreshes it on a substep interval instead.  These tests pin the safety
claims: conservation is structurally unaffected (the same zq enters
adjacent layers' fluxes), trajectories stay close to the exact path, and
the default (1) is bit-identical to the original code.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.step import day_step


def _build_small(n):
    import __graft_entry__ as ge
    return ge._build(n)


def _run_days(state, forcing, params, geom, cfg, ndays, **kw):
    step = jax.jit(lambda s, f: day_step(
        s, f, params, geom, cfg.dt, cfg.nisurf, **kw))
    worst = 0.0
    for _ in range(ndays):
        state, diags = step(state, forcing)
        worst = max(worst, float(jnp.max(diags["max_abs_residual"])))
    return state, worst


import pytest


@pytest.mark.parametrize("k", [4, 8])
def test_refresh_interval_conserves_and_tracks_exact(k):
    n = 256
    _, state, forcing, params, geom, cfg = _build_small(n)
    exact, res1 = _run_days(state, forcing, params, geom, cfg, 20)
    lazy, res4 = _run_days(state, forcing, params, geom, cfg, 20,
                           zd09_every=k)
    # Conservation: the reference's own 0.1 mm bound holds regardless of
    # profile staleness.
    assert res1 < 0.1 and res4 < 0.1
    # Trajectory drift after 20 days stays small (the table moves mm/day,
    # so a 4-substep-stale profile barely changes fluxes).
    a = np.asarray(exact.soil.h2osoi_liq)
    b = np.asarray(lazy.soil.h2osoi_liq)
    assert np.all(np.isfinite(b))
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(lazy.soil.zwt),
                               np.asarray(exact.soil.zwt),
                               rtol=5e-3, atol=5e-3)


def test_default_is_bit_identical():
    """zd09_every=1 must take the original code path (same compile)."""
    n = 128
    _, state, forcing, params, geom, cfg = _build_small(n)
    a, _ = _run_days(state, forcing, params, geom, cfg, 3)
    b, _ = _run_days(state, forcing, params, geom, cfg, 3, zd09_every=1)
    np.testing.assert_array_equal(np.asarray(a.soil.h2osoi_liq),
                                  np.asarray(b.soil.h2osoi_liq))


def test_pallas_refresh_matches_xla_refresh():
    """Pallas (interpret) and XLA paths agree under the same interval —
    the cond-refresh points line up, so the math is identical."""
    from hybrid9_tpu.physics.pallas_day import pallas_hydrology_day
    n = 256
    _, state, forcing, params, geom, cfg = _build_small(n)

    xla_state, _ = jax.jit(lambda s, f: day_step(
        s, f, params, geom, cfg.dt, cfg.nisurf, zd09_every=6)
    )(state, forcing)
    psoil, pdiags = pallas_hydrology_day(
        state.soil, state.veg, params, forcing, geom, cfg.dt, cfg.nisurf,
        block=128, interpret=True, zd09_every=6)

    np.testing.assert_allclose(np.asarray(psoil.h2osoi_liq),
                               np.asarray(xla_state.soil.h2osoi_liq),
                               rtol=5e-4, atol=5e-3)
    assert float(jnp.max(pdiags["max_abs_residual"])) < 0.1


def test_cached_profile_aquifer_entry_is_fresh():
    """Round-4 blowup regression (mechanism level): the cached ZD09
    profile's aquifer entry zq[nl] is branch-gated at refresh time, so
    a cell whose water table crosses below the column bottom between
    refreshes must NOT see the refresh-time (zeroed) entry — the
    below-column matrix tail would be mis-assembled (observed as a
    wa -> -inf blowup after ~2 years at zd09_every=8).
    soil_water_update now recomputes zq[nl] fresh each call."""
    from hybrid9_tpu.physics.layers import stack, unstack
    from hybrid9_tpu.physics.soilwater import (compute_equilibrium_zq,
                                               soil_water_update)

    n = 64
    _, state, forcing, params, geom, cfg = _build_small(n)
    dt = cfg.dt
    nl = state.soil.h2osoi_liq.shape[1]
    dz = jnp.asarray(geom.dz_soil)
    # Nearly saturated column so the table is physically at the bottom.
    h = params.theta_s * 0.95 * dz[None, :]
    zi_bot = geom.zi[nl] / 1000.0                 # column bottom (m)
    zwt_in = jnp.full((n,), zi_bot - 0.01)        # in-column
    zwt_below = jnp.full((n,), zi_bot + 0.05)     # below-column
    smp = jnp.full((n, nl), -1000.0)
    rootr = state.veg.rootr
    infl = jnp.full((n,), 1.0e-6)
    tran = jnp.full((n,), 1.0e-7)
    zi = jnp.asarray(geom.zi)

    def run(zwt_now, zq):
        return soil_water_update(
            unstack(h), [h[:, i] / dz[i] for i in range(nl)], zwt_now,
            unstack(params.theta_s), unstack(params.hksat),
            unstack(params.psi_s), unstack(params.bsw), infl, tran,
            unstack(rootr), zi, dz, jnp.asarray(geom.zc_soil), dt,
            zq=zq)

    # Stale cache: profile taken at the IN-COLUMN table, used below.
    zq_stale = compute_equilibrium_zq(
        zwt_in, unstack(params.theta_s), unstack(params.psi_s),
        unstack(params.bsw), zi)
    zq_fresh = compute_equilibrium_zq(
        zwt_below, unstack(params.theta_s), unstack(params.psi_s),
        unstack(params.bsw), zi)
    # The stale cache's aquifer entry really is zeroed (the hazard).
    assert float(jnp.max(jnp.abs(zq_stale[nl]))) == 0.0
    assert float(jnp.min(jnp.abs(zq_fresh[nl]))) > 100.0

    out_stale = run(zwt_below, zq_stale)
    out_fresh = run(zwt_below, zq_fresh)
    # With the fix the aquifer coupling (qcharge, the blowup driver)
    # stays in the fresh profile's neighborhood — the residual gap is
    # the accepted per-layer staleness (the table crossed layer 8's
    # boundary between the two profiles), NOT the zeroed-entry
    # mis-assembly, which was off by the ~|psi_s| ~ 600 mm potential
    # jump (orders of magnitude in the flux, opposite sign regimes).
    qs = np.asarray(out_stale.qcharge)
    qf = np.asarray(out_fresh.qcharge)
    assert np.all(np.isfinite(qs))
    assert np.all(np.sign(qs) == np.sign(qf))
    np.testing.assert_allclose(qs, qf, rtol=0.5)


def test_knife_edge_water_table_survives_zd09_interval():
    """Round-4 blowup regression (integration level): a column whose
    water table sits ON the soil-column bottom interface (zwt ==
    zi(nl)) flickers between the in-column and below-column branches
    every substep; 30 days at zd09_every=8 must stay finite and
    conserving (pre-fix this configuration diverged)."""
    n = 64
    _, state, forcing, params, geom, cfg = _build_small(n)
    nl = state.soil.h2osoi_liq.shape[1]
    dtype = state.soil.h2osoi_liq.dtype
    dz = jnp.asarray(geom.dz_soil, dtype)
    zi_bot = geom.zi[nl] / 1000.0
    soil = state.soil.replace(
        h2osoi_liq=(params.theta_s * 0.97 * dz[None, :]).astype(dtype),
        zwt=jnp.full((n,), zi_bot, dtype),  # exactly on the interface
        wa=jnp.full((n,), 4500.0, dtype))
    state = state.replace(soil=soil)
    state, worst = _run_days(state, forcing, params, geom, cfg, 30,
                             zd09_every=8)
    assert np.all(np.isfinite(np.asarray(state.soil.wa)))
    assert np.all(np.isfinite(np.asarray(state.soil.zwt)))
    assert np.all(np.isfinite(np.asarray(state.soil.h2osoi_liq)))
    assert worst < 0.1


def test_refresh_interval_drift_bounded_60_days():
    """VERDICT r3 item 3 (regression beyond 20 days): the k=8
    approximation's trajectory drift over 60 days stays bounded and
    does NOT accelerate (second-30-day drift growth comparable to the
    first's; the knife-edge blowup mode is pinned separately)."""
    n = 128
    _, state, forcing, params, geom, cfg = _build_small(n)
    exact20, _ = _run_days(state, forcing, params, geom, cfg, 20)
    lazy20, _ = _run_days(state, forcing, params, geom, cfg, 20,
                          zd09_every=8)
    exact60, r1 = _run_days(state, forcing, params, geom, cfg, 60)
    lazy60, r8 = _run_days(state, forcing, params, geom, cfg, 60,
                           zd09_every=8)
    assert r1 < 0.1 and r8 < 0.1

    def gap(a, b):
        return float(np.max(np.abs(np.asarray(a.soil.h2osoi_liq)
                                   - np.asarray(b.soil.h2osoi_liq))))

    g20 = gap(exact20, lazy20)
    g60 = gap(exact60, lazy60)
    assert np.all(np.isfinite(np.asarray(lazy60.soil.h2osoi_liq)))
    # Bounded in absolute terms, and sub-linear-ish in time: 3x the
    # window must not grow the max layer-water gap by more than ~6x.
    assert g60 < 3.0, f"60-day drift {g60} mm"
    assert g60 < 6.0 * max(g20, 0.05), \
        f"drift accelerating: {g20} mm @20d -> {g60} mm @60d"
    np.testing.assert_allclose(np.asarray(lazy60.soil.zwt),
                               np.asarray(exact60.soil.zwt),
                               rtol=2e-2, atol=2e-2)


def test_flagship_scope_drift_bounded_one_year():
    """VERDICT r4 item 2 (regression leg): the k=8 approximation under
    the SHIPPED production defaults — snow + albedo + soil ice/thermal
    + carbon + routing, which all interact with the water table — stays
    finite and climatologically small over a full year (beyond the
    60-day reference-scope window above).  The 10-year climatological
    bound lives in scripts/zd09_drift.py --scope flagship."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    means = {}
    states = {}
    for k in (1, 8):
        cfg = Config(resolution_deg=12.0, start_year=1901,
                     end_year=1901, nisurf=8, cell_block=32,
                     zd09_every=k, write_annual=False,
                     forcing_block_days=366)
        grid, params = load_soil(cfg)
        provider = SyntheticForcingProvider(grid.n_padded, seed=0,
                                            lat=grid.cell_lat)
        sim = Simulation(cfg, params, land_grid=grid)
        m = sim.run_year(1901, provider)
        nl = grid.n_land
        means[k] = {f: np.asarray(m[f])[:nl]
                    for f in ("evap", "rnf", "swe", "soil_ice",
                              "c_soil", "nee", "discharge")}
        states[k] = np.asarray(sim.state.soil.zwt)[:nl]
        assert float(np.max(np.asarray(m["max_abs_residual"])[:nl])) \
            < 0.1

    for f, m1 in means[1].items():
        m8 = means[8][f]
        assert np.all(np.isfinite(m8)), f"{f} non-finite under k=8"
        # Yardstick: the field's own spatial variability (one year has
        # no interannual std); inert fields (all-zero) must stay zero.
        scale = max(float(np.std(m1)), 1.0e-9)
        drift = float(np.mean(np.abs(m8 - m1)))
        assert drift < 0.05 * scale + 1.0e-6, \
            f"{f}: mean|k8-k1| {drift:.3e} vs spatial std {scale:.3e}"
    np.testing.assert_allclose(states[8], states[1], rtol=5e-3,
                               atol=5e-3)
