"""Two-layer cold-content snowpack (Config.snow_scheme = "twolayer").

Pins the behaviors the single-store degree-day scheme cannot produce:
ripening delay (a cold pack absorbs melt energy before releasing water),
refreeze of rain-on-snow, liquid retention, layer overflow — plus exact
water conservation through every process and the day_step integration
with the swe diagnostic mirror.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.snow import (SnowParams, TwoLayerSnowParams,
                                      snow_step, snow_step_two_layer)
from hybrid9_tpu.state import SnowpackState


def _pack(n=1, surf=0.0, base=0.0, liq=0.0, t_surf=None, t_base=None,
          dtype=jnp.float64):
    pk = SnowpackState.zeros(n, dtype)
    return pk.replace(
        swe_surf=jnp.full((n,), surf, dtype),
        swe_base=jnp.full((n,), base, dtype),
        w_liq=jnp.full((n,), liq, dtype),
        t_surf=jnp.full((n,), c.TF if t_surf is None else t_surf, dtype),
        t_base=jnp.full((n,), c.TF if t_base is None else t_base, dtype))


def _total(pk):
    return np.asarray(pk.swe_surf + pk.swe_base + pk.w_liq)


def test_conservation_random():
    """d(ice + liquid) + outflow + capped == pr, always."""
    p = TwoLayerSnowParams(swe_cap=200.0)
    rng = np.random.RandomState(3)
    n = 512
    pk = SnowpackState.zeros(n, jnp.float64).replace(
        swe_surf=jnp.asarray(rng.rand(n) * 120.0),
        swe_base=jnp.asarray(rng.rand(n) * 150.0),
        w_liq=jnp.asarray(rng.rand(n) * 5.0),
        t_surf=jnp.asarray(c.TF - rng.rand(n) * 20.0),
        t_base=jnp.asarray(c.TF - rng.rand(n) * 10.0))
    tas = jnp.asarray(250.0 + rng.rand(n) * 40.0)
    pr = jnp.asarray(rng.rand(n) * 30.0 / c.SDAY)
    pk1, pr_eff, melt, capped = jax.jit(snow_step_two_layer)(
        pk, tas, pr, p)
    lhs = (_total(pk1) - _total(pk) + np.asarray(pr_eff) * c.SDAY
           + np.asarray(capped))
    np.testing.assert_allclose(lhs, np.asarray(pr) * c.SDAY,
                               rtol=1e-9, atol=1e-9)
    for f in (pk1.swe_surf, pk1.swe_base, pk1.w_liq):
        assert np.all(np.asarray(f) >= 0.0)
    assert np.all(np.asarray(pk1.t_surf) <= c.TF + 1e-9)


def test_ripening_delay_vs_degree_day():
    """A deeply cold pack releases no water on the first warm day
    (energy goes into warming), while the degree-day store melts
    immediately — the key fidelity difference."""
    p2 = TwoLayerSnowParams()
    p1 = SnowParams()
    # 200 mm pack at -20 C: cold content ~ 0.0063*20*200 = 25 mm >> one
    # warm day's 3*2=6 mm of degree-day energy.
    pk = _pack(surf=100.0, base=100.0, t_surf=c.TF - 20.0,
               t_base=c.TF - 20.0)
    tas = jnp.full(1, c.TF + 2.0)
    pr = jnp.zeros(1)
    pk1, pr_eff2, melt2, _ = snow_step_two_layer(pk, tas, pr, p2)
    assert float(melt2[0]) == 0.0
    assert float(pr_eff2[0]) == 0.0
    # The pack warmed instead.
    assert float(pk1.t_surf[0]) > c.TF - 20.0

    swe1, pr_eff1, melt1, _ = snow_step(jnp.full(1, 200.0), tas, pr, p1)
    assert float(melt1[0]) > 0.0          # degree-day melts at once

    # A ripe pack (at TF) does melt under the same forcing; small melt
    # is retained by the pack's liquid capacity, so drive a hot day to
    # see outflow.
    pk_ripe = _pack(surf=100.0, base=100.0)
    _, pr_eff_r, melt_r, _ = snow_step_two_layer(pk_ripe, tas, pr, p2)
    assert float(melt_r[0]) > 0.0
    hot = jnp.full(1, c.TF + 10.0)
    _, pr_eff_h, melt_h, _ = snow_step_two_layer(pk_ripe, hot, pr, p2)
    assert float(melt_h[0]) > float(melt_r[0])
    assert float(pr_eff_h[0]) > 0.0


def test_rain_on_snow_refreezes():
    """Rain falling on a cold pack refreezes into ice instead of
    draining; the same rain on a ripe pack drains (above retention)."""
    p = TwoLayerSnowParams()
    rain_day = 5.0
    pr = jnp.full(1, rain_day / c.SDAY)
    tas = jnp.full(1, c.TF + 4.0)       # all rain, pack still cold
    cold = _pack(surf=80.0, base=120.0, t_surf=c.TF - 15.0,
                 t_base=c.TF - 15.0)
    pk1, pr_eff, _, _ = snow_step_two_layer(cold, tas, pr, p)
    # Refrozen: ice grew, nothing (or nearly nothing) drained.
    assert float(pk1.swe_surf[0] + pk1.swe_base[0]) > 200.0
    assert float(pr_eff[0]) * c.SDAY < 0.5

    ripe = _pack(surf=80.0, base=120.0, liq=p.hold_frac * 200.0)
    pk2, pr_eff2, melt2, _ = snow_step_two_layer(ripe, tas, pr, p)
    # Saturated ripe pack passes rain + melt through.
    assert float(pr_eff2[0]) * c.SDAY > rain_day * 0.9


def test_surface_overflow_and_capping():
    p = TwoLayerSnowParams(surf_max=100.0, swe_cap=300.0)
    # Huge snowfall: surface layer caps at surf_max, excess to base.
    pk = _pack()
    tas = jnp.full(1, 250.0)
    pr = jnp.full(1, 150.0 / c.SDAY)
    pk1, _, _, capped = snow_step_two_layer(pk, tas, pr, p)
    assert float(pk1.swe_surf[0]) <= 100.0 + 1e-9
    np.testing.assert_allclose(_total(pk1), 150.0, rtol=1e-9)
    assert float(capped[0]) == 0.0
    # Push past the pack cap: overflow leaves as ice runoff.
    pk_big = _pack(surf=100.0, base=260.0)
    pk2, _, _, capped2 = snow_step_two_layer(pk_big, tas, pr, p)
    assert float(pk2.swe_surf[0] + pk2.swe_base[0]) <= 300.0 + 1e-9
    assert float(capped2[0]) > 0.0


def test_day_step_twolayer_integration(layer_grid):
    """day_step dispatches on TwoLayerSnowParams, threads the pack and
    mirrors the total into state.swe."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(256)
    cold = forcing.replace(tas=jnp.full(256, 250.0),
                           pr=jnp.full(256, 8.0 / c.SDAY))
    st, diags = day_step(state, cold, params, geom, cfg.dt, cfg.nisurf,
                         snow=TwoLayerSnowParams())
    np.testing.assert_allclose(np.asarray(st.snowpack.swe_surf), 8.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.swe), 8.0, rtol=1e-5)
    # New snow fell at 250 K; the pack records its cold content.
    assert float(jnp.max(st.snowpack.t_surf)) < c.TF
    assert float(jnp.max(diags["max_abs_residual"])) < 0.1


def test_simulation_twolayer_year(tmp_path):
    """A short coupled run under snow_scheme='twolayer' conserves and
    banks winter snow."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=60, cell_block=32, nisurf=4,
                 use_pallas=False, snow_scheme="twolayer",
                 output_path=str(tmp_path), write_annual=False)
    grid, params = load_soil(cfg)
    provider = SyntheticForcingProvider(grid.n_padded, seed=5,
                                        lat=grid.cell_lat)
    sim = Simulation(cfg, params, land_grid=grid)
    means = sim.run_year(1901, provider)
    assert float(np.max(means["max_abs_residual"][:grid.n_land])) < 0.1
    # Cold (high-latitude) cells accumulated a pack at some point.
    assert float(np.max(means["swe"][:grid.n_land])) > 0.0
    assert np.all(np.isfinite(np.asarray(sim.state.snowpack.t_surf)))


def test_scheme_switch_preserves_legacy_swe(layer_grid):
    """Resuming a degree-day checkpoint under snow_scheme='twolayer'
    must bank the legacy SWE in the pack, not delete it; and a pack
    stranded by the reverse switch cannot resurrect melted water."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    _, state, forcing, params, geom, cfg = ge._build(64)
    f32 = jnp.float32
    cold = forcing.replace(tas=jnp.full(64, 250.0, f32),
                           pr=jnp.zeros(64, f32))
    # Legacy degree-day store: 500 mm, empty snowpack struct.
    state = state.replace(swe=jnp.full(64, 500.0, f32))
    st, _ = day_step(state, cold, params, geom, cfg.dt, cfg.nisurf,
                     snow=TwoLayerSnowParams())
    np.testing.assert_allclose(np.asarray(st.swe), 500.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.snowpack.swe_base), 500.0,
                               rtol=1e-6)
    # Reverse-switch staleness: swe melted down to 200 while the pack
    # struct still says 300 -> the pack is scaled to swe, no
    # resurrection.
    stale = st.replace(
        swe=jnp.full(64, 200.0, f32),
        snowpack=st.snowpack.replace(
            swe_base=jnp.full(64, 300.0, f32)))
    st2, _ = day_step(stale, cold, params, geom, cfg.dt, cfg.nisurf,
                      snow=TwoLayerSnowParams())
    np.testing.assert_allclose(np.asarray(st2.swe), 200.0, rtol=1e-5)
