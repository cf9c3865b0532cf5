"""Frozen-soil hydraulic impedance (new capability — the reference has
no soil freezing): impedance values, substep coupling, conservation,
Pallas-kernel parity with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.soiltemp import freeze_impedance


def test_impedance_values():
    t = jnp.asarray([[280.0, c.TF, c.TF - 1.0, c.TF - 2.0, c.TF - 50.0]])
    f = np.asarray(freeze_impedance(t))[0]
    assert f[0] == 1.0 and f[1] == 1.0          # unfrozen: exactly 1
    np.testing.assert_allclose(f[2], 10.0 ** -3.0, rtol=1e-5)
    np.testing.assert_allclose(f[3], 1e-6, rtol=1e-5)
    np.testing.assert_allclose(f[4], 1e-6, rtol=1e-5)  # ramp saturates


def _day(state, forcing, params, geom, cfg, **kw):
    from hybrid9_tpu.step import day_step
    return day_step(state, forcing, params, geom, cfg.dt, cfg.nisurf,
                    **kw)


def test_frozen_ground_sheds_rain(layer_grid):
    """A frozen column under heavy rain turns it into surface runoff;
    unfrozen soil infiltrates it.  Water balance holds in both."""
    import __graft_entry__ as ge

    step_fn, state, forcing, params, geom, cfg = ge._build(256)
    rain = forcing.replace(pr=jnp.full(256, 30.0 / c.SDAY),
                           tas=jnp.full(256, 275.0))  # above freezing air
    frozen = state.replace(t_soil=jnp.full_like(state.t_soil, 260.0))

    st_f, d_f = _day(frozen, rain, params, geom, cfg, freeze=True)
    st_u, d_u = _day(state, rain, params, geom, cfg, freeze=True)
    assert float(jnp.max(d_f["max_abs_residual"])) < 0.1
    assert float(jnp.max(d_u["max_abs_residual"])) < 0.1
    # Frozen cells shed far more of the day's rain as runoff.
    assert (float(jnp.mean(d_f["rnf_day"]))
            > 2.0 * float(jnp.mean(d_u["rnf_day"])))
    # And their soils took in less water.
    gain_f = float(jnp.sum(st_f.soil.h2osoi_liq - frozen.soil.h2osoi_liq))
    gain_u = float(jnp.sum(st_u.soil.h2osoi_liq - state.soil.h2osoi_liq))
    assert gain_f < gain_u


def test_freeze_off_matches_warm(layer_grid):
    """freeze=True with a warm column is bitwise the freeze=False path
    (impedance is exactly 1 when unfrozen)."""
    import __graft_entry__ as ge

    step_fn, state, forcing, params, geom, cfg = ge._build(128)
    warm = state.replace(t_soil=jnp.full_like(state.t_soil, 290.0))
    st_a, d_a = _day(warm, forcing, params, geom, cfg, freeze=True)
    st_b, d_b = _day(warm, forcing, params, geom, cfg, freeze=False)
    np.testing.assert_array_equal(np.asarray(st_a.soil.h2osoi_liq),
                                  np.asarray(st_b.soil.h2osoi_liq))
    np.testing.assert_array_equal(np.asarray(d_a["rnf_day"]),
                                  np.asarray(d_b["rnf_day"]))


def test_pallas_path_with_impedance(layer_grid):
    """The Pallas day kernel (interpret mode) matches the XLA scan path
    with impedance active."""
    import __graft_entry__ as ge
    from hybrid9_tpu.physics.pallas_day import pallas_hydrology_day
    from hybrid9_tpu.physics.hydrology import derive_forcing, \
        hydrology_substep
    from hybrid9_tpu.physics.soiltemp import freeze_impedance

    step_fn, state, forcing, params, geom, cfg = ge._build(256)
    t_soil = jnp.where(
        jnp.arange(256)[:, None] % 2 == 0, 260.0, 285.0
    ) * jnp.ones_like(state.t_soil)
    imp = freeze_impedance(t_soil)

    soil_p, pd = pallas_hydrology_day(state.soil, state.veg, params,
                                      forcing, geom, cfg.dt, 4,
                                      block=256, interpret=True, imp=imp)

    fd = derive_forcing(forcing)
    soil_x = state.soil
    for _ in range(4):
        soil_x, fx = hydrology_substep(soil_x, state.veg, params, fd,
                                       geom, cfg.dt, imp=imp)
    np.testing.assert_allclose(np.asarray(soil_p.h2osoi_liq),
                               np.asarray(soil_x.h2osoi_liq),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(soil_p.zwt),
                               np.asarray(soil_x.zwt), rtol=2e-5,
                               atol=2e-5)
