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
