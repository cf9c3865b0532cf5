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
