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


def test_latent_heat_zero_curtain():
    """With the apparent-heat-capacity freeze band, a cooling column
    lingers near 0 C (zero curtain) instead of snapping through; with
    the band off it crosses quickly.  Same steady cooling flux."""
    from hybrid9_tpu.physics import constants as c

    g = LayerGrid.from_interfaces()
    nl = g.nsoil
    n = 4
    t = jnp.full((n, nl), c.TF + 0.5)
    theta_s = jnp.full((n, nl), 0.45)
    theta = jnp.full((n, nl), 0.35)          # wet soil: lots of fusion
    dz = tuple(map(float, g.dz[:nl]))
    zc = tuple(map(float, g.zc[:nl]))
    cool = jnp.full(n, -30.0)                # W/m^2 out of the column

    t_fast = t
    t_slow = t
    for day in range(20):
        t_fast = soil_temperature_step(t_fast, theta, theta_s, cool,
                                       dz, zc, 86400.0)
        t_slow = soil_temperature_step(t_slow, theta, theta_s, cool,
                                       dz, zc, 86400.0,
                                       latent_ramp=2.0)
        if day == 4:
            # Five days in: the plain column has snapped well below the
            # band, the latent column is still held inside it.
            assert float(t_fast[0, 0]) < c.TF - 5.0
            assert float(t_slow[0, 0]) > c.TF - 2.0
    # After 20 days of steady cooling the latent column has finally
    # broken through the band, but stays far behind the plain one.
    assert float(t_fast[0, 0]) < c.TF - 15.0
    assert float(t_slow[0, 0]) < c.TF - 2.0
    assert float(t_slow[0, 0]) > float(t_fast[0, 0]) + 10.0


def test_latent_energy_closure():
    """The implicit solve still closes energy with the apparent
    capacity: sum(c_app dz dT) per step equals the boundary flux."""
    from hybrid9_tpu.physics import constants as c

    t, theta, theta_s, dz, zc = _setup(seed=3)
    t = jnp.clip(t, c.TF - 3.0, c.TF + 3.0)  # straddle the band
    flux = jnp.asarray(np.linspace(-50.0, 50.0, t.shape[0]))
    dt = 86400.0
    ramp = 2.0
    from hybrid9_tpu.physics.soiltemp import C_SOLID, C_WATER

    t1 = soil_temperature_step(t, theta, theta_s, flux, dz, zc, dt,
                               latent_ramp=ramp)
    # Reconstruct the corrector's capacity: band membership comes from
    # the plain-capacity predictor pass.
    t_est = np.asarray(soil_temperature_step(t, theta, theta_s, flux,
                                             dz, zc, dt))
    lo = np.minimum(np.asarray(t), t_est)
    hi = np.maximum(np.asarray(t), t_est)
    cv = C_SOLID * (1.0 - np.asarray(theta_s)) \
        + C_WATER * np.asarray(theta)
    band = (lo < c.TF) & (hi > c.TF - ramp)
    cv = cv + band * (c.RHOW * c.LFUS * np.asarray(theta) / ramp)
    de = np.sum(cv * np.asarray(dz)[None, :] / 1000.0
                * np.asarray(t1 - t), axis=1)
    np.testing.assert_allclose(de, np.asarray(flux) * dt, rtol=1e-4,
                               atol=1.0)
