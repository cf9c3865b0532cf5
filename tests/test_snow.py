"""Snowpack scheme: partition, melt, conservation, day_step coupling
(new capability beyond the reference — it treats all precip as rain)."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.snow import SnowParams, snow_step


def test_partition_and_melt_limits():
    p = SnowParams()
    n = 5
    tas = jnp.asarray([250.0, c.TF - 1.0, c.TF + 1.0, c.TF + 3.0, 300.0])
    pr = jnp.full(n, 10.0 / c.SDAY)     # 10 mm/day
    swe0 = jnp.zeros(n)
    swe, pr_eff, melt, capped = jax.jit(snow_step)(swe0, tas, pr, p)
    swe, pr_eff, melt = map(np.asarray, (swe, pr_eff, melt))
    # Deep cold: all snow, no melt, nothing reaches the soil.
    assert swe[0] == 10.0 and pr_eff[0] == 0.0
    # At t_snow: still all snow.
    assert swe[1] == 10.0
    # Mid-ramp (+1 K): half snow; melt 3 mm/day releases part of it.
    assert 0.0 < swe[2] < 10.0
    # At/above t_rain: all rain, pack stays empty.
    np.testing.assert_allclose(pr_eff[3] * c.SDAY, 10.0, rtol=1e-6)
    assert swe[3] == 0.0 and swe[4] == 0.0


def test_water_conservation():
    """swe' - swe + pr_eff*day == pr*day, elementwise, always."""
    p = SnowParams()
    rng = np.random.RandomState(0)
    n = 256
    swe = jnp.asarray(rng.rand(n) * 50.0)
    tas = jnp.asarray(260.0 + rng.rand(n) * 30.0)
    pr = jnp.asarray(rng.rand(n) * 20.0 / c.SDAY)
    swe1, pr_eff, melt, capped = jax.jit(snow_step)(swe, tas, pr, p)
    lhs = (np.asarray(swe1 - swe) + np.asarray(pr_eff) * c.SDAY
           + np.asarray(capped))
    np.testing.assert_allclose(lhs, np.asarray(pr) * c.SDAY, rtol=1e-5,
                               atol=1e-5)
    assert np.all(np.asarray(swe1) >= 0.0)


def test_seasonal_cycle():
    """A cold winter builds a pack; a warm spring drains it as melt."""
    p = SnowParams()
    swe = jnp.zeros(1)
    pr = jnp.full(1, 5.0 / c.SDAY)
    step = jax.jit(snow_step)
    for _ in range(60):                       # 60 winter days at -10 C
        swe, pr_eff, _, _ = step(swe, jnp.full(1, c.TF - 10.0), pr, p)
    assert float(swe[0]) == 300.0             # all precip banked
    melt_total = 0.0
    for _ in range(120):                      # spring at +5 C, no precip
        swe, pr_eff, melt, _ = step(swe, jnp.full(1, c.TF + 5.0),
                                    jnp.zeros(1), p)
        melt_total += float(melt[0])
    assert float(swe[0]) == 0.0
    np.testing.assert_allclose(melt_total, 300.0, rtol=1e-6)


def test_day_step_with_snow(layer_grid):
    """day_step threads SWE; cold cells bank precipitation as snow and
    their soils receive nothing."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    step_fn, state, forcing, params, geom, cfg = ge._build(256)
    cold = forcing.replace(tas=jnp.full(256, 250.0),
                           pr=jnp.full(256, 8.0 / c.SDAY))
    st, diags = day_step(state, cold, params, geom, cfg.dt, cfg.nisurf,
                         snow=SnowParams())
    np.testing.assert_allclose(np.asarray(st.swe), 8.0, rtol=1e-6)
    # Without snow the same day leaves swe at zero.
    st2, _ = day_step(state, cold, params, geom, cfg.dt, cfg.nisurf)
    assert float(jnp.sum(st2.swe)) == 0.0
    # Soil water: the snow run must admit less water than the rain run.
    assert (float(jnp.sum(st.soil.h2osoi_liq))
            < float(jnp.sum(st2.soil.h2osoi_liq)))


def test_snow_capping():
    """Packs cannot exceed swe_cap; the overflow leaves as ice runoff
    (CLM-style capping) and conservation holds through the cap."""
    p = SnowParams(swe_cap=100.0)
    swe = jnp.full(1, 95.0)
    pr = jnp.full(1, 20.0 / c.SDAY)
    swe1, pr_eff, melt, capped = jax.jit(snow_step)(
        swe, jnp.full(1, 250.0), pr, p)
    assert float(swe1[0]) == 100.0
    np.testing.assert_allclose(float(capped[0]), 15.0, rtol=1e-6)
    assert float(pr_eff[0]) == 0.0
    # Conservation through the cap.
    np.testing.assert_allclose(
        float(swe1[0] - swe[0]) + float(capped[0]), 20.0, rtol=1e-6)


def test_capped_snow_routes_to_rivers(layer_grid):
    """day_step adds the capping overflow to the day's runoff so it
    reaches the river network."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    step_fn, state, forcing, params, geom, cfg = ge._build(64)
    state = state.replace(swe=jnp.full(64, 999.0))
    cold = forcing.replace(tas=jnp.full(64, 250.0),
                           pr=jnp.full(64, 10.0 / c.SDAY))
    st, diags = day_step(state, cold, params, geom, cfg.dt, cfg.nisurf,
                         snow=SnowParams())
    np.testing.assert_allclose(np.asarray(st.swe), 1000.0, rtol=1e-6)
    assert float(jnp.min(diags["rnf_day"])) >= 9.0   # ~9 mm overflow


def test_snow_albedo_feedback(layer_grid):
    """A deep pack collapses absorbed shortwave: with the snow-albedo
    feedback on, a snow-covered cell evaporates far less than the same
    cell with the feedback off, and a bare cell is unaffected."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step, snow_absorptivity

    # Absorptivity bounds: bare = 0.92, deep pack -> (1 - alpha_snow).
    a = np.asarray(snow_absorptivity(
        jnp.asarray([0.0, 10.0, 1.0e4]), 0.70, 10.0))
    np.testing.assert_allclose(a[0], 0.92, rtol=1e-6)
    np.testing.assert_allclose(a[1], 0.5 * (0.92 + 0.30), rtol=1e-6)
    assert abs(a[2] - 0.30) < 0.01

    _, state, forcing, params, geom, cfg = ge._build(64)
    f32 = jnp.float32
    # Mild melt conditions over a deep pack, no precipitation.
    melty = forcing.replace(tas=jnp.full(64, c.TF + 2.0, f32),
                            pr=jnp.zeros(64, f32))
    snowy = state.replace(swe=jnp.full(64, 200.0, f32))
    st_on, d_on = day_step(snowy, melty, params, geom, cfg.dt,
                           cfg.nisurf, snow=SnowParams(),
                           snow_albedo=(0.70, 10.0))
    st_off, d_off = day_step(snowy, melty, params, geom, cfg.dt,
                             cfg.nisurf, snow=SnowParams())
    evap_on = float(jnp.sum(d_on["evap_day"]))
    evap_off = float(jnp.sum(d_off["evap_day"]))
    assert evap_on < 0.55 * evap_off
    assert float(jnp.max(d_on["max_abs_residual"])) < 0.1

    # Bare ground: the feedback is a no-op.
    st_b1, d_b1 = day_step(state, melty, params, geom, cfg.dt,
                           cfg.nisurf, snow=SnowParams(),
                           snow_albedo=(0.70, 10.0))
    st_b2, d_b2 = day_step(state, melty, params, geom, cfg.dt,
                           cfg.nisurf, snow=SnowParams())
    np.testing.assert_allclose(np.asarray(d_b1["evap_day"]),
                               np.asarray(d_b2["evap_day"]),
                               rtol=1e-6, atol=1e-9)


def test_snow_albedo_pallas_path(layer_grid):
    """sw_abs threads through the Pallas kernel (interpret) and the
    shard_map'd variant identically to the XLA path."""
    import __graft_entry__ as ge
    from jax.sharding import Mesh
    from hybrid9_tpu.physics.hydrology import derive_forcing
    from hybrid9_tpu.physics.pallas_day import (
        pallas_hydrology_day, pallas_hydrology_day_sharded)
    from hybrid9_tpu.step import day_step, snow_absorptivity

    _, state, forcing, params, geom, cfg = ge._build(256)
    f32 = jnp.float32
    swe = jnp.full(256, 150.0, f32)
    sw_abs = snow_absorptivity(swe, 0.70, 10.0)

    ref_soil = state.soil
    # XLA single substep chain via day_step (vegetation off to isolate).
    st_x, d_x = day_step(state.replace(swe=swe),
                         forcing, params, geom, cfg.dt, cfg.nisurf,
                         snow=SnowParams(), snow_albedo=(0.70, 10.0),
                         vegetation=False)
    psoil, pd = pallas_hydrology_day(
        ref_soil, state.veg, params,
        forcing.replace(pr=jnp.zeros(256, f32)), geom, cfg.dt,
        cfg.nisurf, block=128, interpret=True, sw_abs=sw_abs)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("cells",))
    ssoil, sd = pallas_hydrology_day_sharded(
        ref_soil, state.veg, params,
        forcing.replace(pr=jnp.zeros(256, f32)), geom, cfg.dt,
        cfg.nisurf, mesh=mesh, block=64, interpret=True, sw_abs=sw_abs)
    np.testing.assert_allclose(np.asarray(ssoil.h2osoi_liq),
                               np.asarray(psoil.h2osoi_liq),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.max(pd["max_abs_residual"])) < 0.1
    assert float(jnp.max(sd["max_abs_residual"])) < 0.1
