"""Prognostic soil ice: explicit phase change (energy <-> mass),
ice-fraction impedance, coupled day-step behaviour and conservation.
New capability beyond the reference (which has no soil freezing)."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.config import LayerGrid
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.soiltemp import (C_ICE, C_SOLID, C_WATER,
                                          WATMIN, freeze_impedance_from_ice,
                                          phase_change)


def _setup(n=32, seed=0):
    g = LayerGrid.from_interfaces()
    nl = g.nsoil
    rng = np.random.RandomState(seed)
    t = jnp.asarray(c.TF + rng.uniform(-10.0, 10.0, (n, nl)))
    theta_s = jnp.asarray(0.35 + 0.15 * rng.rand(n, nl))
    dz = np.asarray(g.dz[:nl])
    liq = jnp.asarray(0.3 * np.asarray(theta_s) * dz[None, :])
    ice = jnp.asarray(0.1 * np.asarray(theta_s) * dz[None, :]
                      * rng.randint(0, 2, (n, nl)))
    return t, liq, ice, theta_s, tuple(map(float, dz))


def _heat_capacity(liq, ice, theta_s, dz):
    dz_m = np.asarray(dz)[None, :] / 1000.0
    th_l = np.asarray(liq) / (dz_m * 1000.0)
    th_i = np.asarray(ice) / (dz_m * 1000.0)
    return (C_SOLID * (1.0 - np.asarray(theta_s)) + C_WATER * th_l
            + C_ICE * th_i) * dz_m


def test_phase_change_conserves_water_and_energy():
    t, liq, ice, theta_s, dz = _setup()
    t1, liq1, ice1 = jax.jit(phase_change)(t, liq, ice, theta_s, dz)
    # Water: liquid + ice invariant per layer, to round-off.
    np.testing.assert_allclose(np.asarray(liq1 + ice1),
                               np.asarray(liq + ice), rtol=1e-12)
    # Energy: sensible change equals fusion enthalpy exchanged, using
    # the pre-step heat capacity (the one the inversion used).
    hc = _heat_capacity(liq, ice, theta_s, dz)
    lhs = hc * np.asarray(t1 - t)
    rhs = np.asarray(ice1 - ice) * c.LFUS
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6, atol=1e-3)
    # No negative stores; liquid keeps the watmin floor where it froze.
    assert np.all(np.asarray(ice1) >= 0.0)
    froze = np.asarray(ice1) > np.asarray(ice)
    assert np.all(np.asarray(liq1)[froze] >= WATMIN - 1e-9)


def test_phase_change_never_overshoots_tf():
    """Freezing warms at most to TF; melting cools at most to TF."""
    t, liq, ice, theta_s, dz = _setup(seed=2)
    t1, _, _ = jax.jit(phase_change)(t, liq, ice, theta_s, dz)
    t0 = np.asarray(t)
    t1 = np.asarray(t1)
    below = t0 < c.TF
    above = t0 > c.TF
    assert np.all(t1[below] <= c.TF + 1e-6)
    assert np.all(t1[above] >= c.TF - 1e-6)
    # Phase change moves temperature toward TF, never away.
    assert np.all((t1[below] >= t0[below] - 1e-6))
    assert np.all((t1[above] <= t0[above] + 1e-6))


def test_melt_limited_by_ice_freeze_by_liquid():
    g = LayerGrid.from_interfaces()
    nl = g.nsoil
    dz = tuple(map(float, g.dz[:nl]))
    theta_s = jnp.full((2, nl), 0.45)
    # Cell 0: warm with a trace of ice -> all ice melts, stays warm.
    # Cell 1: very cold with little liquid -> freezes down to watmin.
    t = jnp.stack([jnp.full(nl, c.TF + 10.0), jnp.full(nl, c.TF - 30.0)])
    liq = jnp.stack([jnp.full(nl, 20.0), jnp.full(nl, 0.5)])
    ice = jnp.stack([jnp.full(nl, 0.01), jnp.zeros(nl)])
    t1, liq1, ice1 = jax.jit(phase_change)(t, liq, ice, theta_s, dz)
    assert np.all(np.asarray(ice1)[0] == 0.0)          # melted out
    assert float(t1[0, 0]) > c.TF + 5.0                # barely cooled
    np.testing.assert_allclose(np.asarray(liq1)[1], WATMIN, rtol=1e-6)
    assert np.all(np.asarray(t1)[1] < c.TF)            # still frozen


def test_impedance_from_ice_fraction():
    liq = jnp.asarray([[10.0, 10.0, 0.01]])
    ice = jnp.asarray([[0.0, 10.0, 10.0]])
    f = np.asarray(freeze_impedance_from_ice(liq, ice))
    np.testing.assert_allclose(f[0, 0], 1.0)           # ice-free
    np.testing.assert_allclose(f[0, 1], 10.0 ** -3.0, rtol=1e-5)
    assert f[0, 2] < 1.1e-6                            # fully frozen


def test_day_step_grows_ice_in_winter(layer_grid):
    """Coupled day steps over a deep-freeze month: ice appears, total
    column water (liquid + ice) is conserved through the phase change,
    and the hydrology residual stays inside the reference bound."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(64)
    dt32 = forcing.tas.dtype
    cold = forcing.replace(tas=jnp.full(64, c.TF - 15.0, dt32),
                           pr=jnp.zeros(64, dt32),
                           rsds=jnp.full(64, 30.0, dt32))
    step = jax.jit(lambda s, f: day_step(
        s, f, params, geom, cfg.dt, cfg.nisurf, freeze=True,
        soil_ice=True))
    res = 0.0
    for _ in range(30):
        state, diags = step(state, cold)
        res = max(res, float(jnp.max(diags["max_abs_residual"])))
    assert res < 0.1
    ice = np.asarray(state.h2osoi_ice)
    assert float(ice.sum()) > 1.0                      # ice accumulated
    assert np.all(np.asarray(state.soil.h2osoi_liq) >= 0.0)
    # Layers holding ice cannot sit above TF (deep ice-free layers are
    # still warm after only a month of diffusion — that is physical).
    t = np.asarray(state.t_soil)
    assert np.all(t[ice > 0.0] <= c.TF + 1e-3)
    assert float(t[:, 0].max()) <= c.TF                # surface frozen


def test_ice_impedance_throttles_infiltration(layer_grid):
    """A rained-on frozen column infiltrates less than an unfrozen one
    when the impedance comes from the prognostic ice store."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(64)
    nl = state.soil.h2osoi_liq.shape[1]
    dt32 = state.t_soil.dtype
    icy = state.replace(
        h2osoi_ice=jnp.full((64, nl), 5.0, dt32),
        t_soil=jnp.full((64, nl), c.TF - 5.0, dt32))
    dt32 = forcing.tas.dtype
    rain = forcing.replace(pr=jnp.full(64, 20.0 / c.SDAY, dt32),
                           tas=jnp.full(64, c.TF + 2.0, dt32))

    st_icy, d_icy = day_step(icy, rain, params, geom, cfg.dt, cfg.nisurf,
                             freeze=True, soil_ice=True)
    st_thaw, d_thaw = day_step(state, rain, params, geom, cfg.dt,
                               cfg.nisurf, freeze=True, soil_ice=True)
    # Frozen ground sheds more of the rain as surface runoff.
    assert (float(jnp.sum(d_icy["rnf_day"]))
            > float(jnp.sum(d_thaw["rnf_day"])))


def test_spring_thaw_releases_water(layer_grid):
    """Warm days after a frozen state melt the ice back to liquid."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(64)
    nl = state.soil.h2osoi_liq.shape[1]
    dt32 = state.t_soil.dtype
    state = state.replace(
        h2osoi_ice=jnp.full((64, nl), 2.0, dt32),
        t_soil=jnp.full((64, nl), c.TF - 1.0, dt32))
    dt32 = forcing.tas.dtype
    warm = forcing.replace(tas=jnp.full(64, c.TF + 15.0, dt32),
                           rsds=jnp.full(64, 250.0, dt32))
    step = jax.jit(lambda s, f: day_step(
        s, f, params, geom, cfg.dt, cfg.nisurf, freeze=True,
        soil_ice=True))
    ice0 = float(jnp.sum(state.h2osoi_ice))
    for _ in range(30):
        state, _ = step(state, warm)
    assert float(jnp.sum(state.h2osoi_ice)) < 0.1 * ice0
