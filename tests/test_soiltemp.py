"""Prognostic soil-temperature column: conservation, response, coupling."""

import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.config import LayerGrid
from hybrid9_tpu.physics.soiltemp import (column_energy,
                                          soil_temperature_step)


def _setup(n=16, seed=0):
    g = LayerGrid.from_interfaces()
    nl = g.nsoil
    rng = np.random.RandomState(seed)
    t = jnp.asarray(270.0 + 30.0 * rng.rand(n, nl))
    theta_s = jnp.asarray(0.35 + 0.15 * rng.rand(n, nl))
    theta = jnp.asarray(np.asarray(theta_s) * rng.uniform(0.2, 1.0,
                                                          (n, nl)))
    dz = tuple(map(float, g.dz[:nl]))
    zc = tuple(map(float, g.zc[:nl]))
    return t, theta, theta_s, dz, zc


def test_zero_flux_conserves_energy():
    t, theta, theta_s, dz, zc = _setup()
    g0 = jnp.zeros(t.shape[0])
    e0 = column_energy(t, theta, theta_s, dz)
    t1 = t
    for _ in range(30):
        t1 = soil_temperature_step(t1, theta, theta_s, g0, dz, zc,
                                   86400.0)
    e1 = column_energy(t1, theta, theta_s, dz)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), rtol=1e-6)
    # Diffusion homogenises the profile.
    spread0 = float(jnp.max(jnp.ptp(t, axis=1)))
    spread1 = float(jnp.max(jnp.ptp(t1, axis=1)))
    assert spread1 < 0.2 * spread0


def test_energy_balance_with_flux():
    """Energy gained equals the integrated ground heat flux."""
    t, theta, theta_s, dz, zc = _setup()
    g = jnp.asarray(np.linspace(-40.0, 80.0, t.shape[0]))
    dt = 86400.0
    e0 = column_energy(t, theta, theta_s, dz)
    t1 = t
    ndays = 10
    for _ in range(ndays):
        t1 = soil_temperature_step(t1, theta, theta_s, g, dz, zc, dt)
    e1 = column_energy(t1, theta, theta_s, dz)
    np.testing.assert_allclose(np.asarray(e1 - e0),
                               np.asarray(g) * dt * ndays, rtol=1e-5,
                               atol=1.0)
    # Heating warms the surface first.
    hot = np.asarray(g) > 50.0
    dT = np.asarray(t1 - t)
    assert np.all(dT[hot, 0] > dT[hot, -1])


def test_coupled_day_step_updates_temperature():
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(128)
    st, diags = day_step(state, forcing, params, geom, cfg.dt,
                         cfg.nisurf)
    t0 = np.asarray(state.t_soil)
    t1 = np.asarray(st.t_soil)
    assert t1.shape == t0.shape
    assert np.all(np.isfinite(t1))
    # Ground heat flux must have moved the surface layer somewhere.
    assert not np.allclose(t1[:, 0], t0[:, 0])
    # Plausible temperature range after one day from 283 K.
    assert np.all((t1 > 240.0) & (t1 < 330.0))


def test_surface_coupling_anchors_to_air():
    """With sensible exchange, the column relaxes to T_air (+ G/h
    offset) instead of drifting unboundedly under a net-negative G."""
    t, theta, theta_s, dz, zc = _setup()
    n = t.shape[0]
    t_air = jnp.full((n,), 285.0)
    g = jnp.full((n,), -5.0)        # persistent small energy deficit
    h = jnp.full((n,), 25.0)
    t1 = t
    for _ in range(400):
        t1 = soil_temperature_step(t1, theta, theta_s, g, dz, zc,
                                   86400.0, t_air=t_air, h_surf=h)
    # Equilibrium surface temperature: T_air + G/h = 285 - 0.2.
    np.testing.assert_allclose(np.asarray(t1[:, 0]), 284.8, atol=0.3)
    np.testing.assert_allclose(np.asarray(t1[:, -1]), 284.8, atol=0.5)
