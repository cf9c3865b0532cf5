"""Lateral groundwater flow: conservation, direction, halo behaviour
under 2-D grid sharding."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask
from hybrid9_tpu.physics.lateral import (LateralParams,
                                         lateral_groundwater_step,
                                         make_lateral_params)


def _setup():
    mask = synthetic_land_mask(resolution_deg=6.0, seed=3)
    grid = make_land_grid(mask, 6.0, pad_multiple=64)
    p = make_lateral_params(grid, k_lat=5.0e-4)
    rng = np.random.RandomState(0)
    wa = jnp.asarray(rng.uniform(1000.0, 5000.0, grid.n_padded),
                     jnp.float32)
    zwt = jnp.asarray(rng.uniform(0.5, 10.0, grid.n_padded), jnp.float32)
    return grid, p, wa, zwt


def test_lateral_conserves_water():
    grid, p, wa, zwt = _setup()
    wa1, net = lateral_groundwater_step(wa, zwt, p)
    np.testing.assert_allclose(float(jnp.sum(net[:grid.n_land])), 0.0,
                               atol=1e-2)
    np.testing.assert_allclose(float(jnp.sum(wa1[:grid.n_land])),
                               float(jnp.sum(wa[:grid.n_land])),
                               rtol=1e-6)
    assert np.all(np.asarray(wa1[:grid.n_land]) >= -1e-4)
    # Padding untouched.
    np.testing.assert_array_equal(np.asarray(wa1[grid.n_land:]),
                                  np.asarray(wa[grid.n_land:]))


def test_water_flows_downhill():
    """On a flat all-land grid, the shallow-water-table cell loses water
    and its neighbours gain it (head difference purely from zwt)."""
    ny = nx = 8
    mask = np.ones((ny, nx), bool)
    flat_idx = jnp.arange(ny * nx)
    p = LateralParams(land_flat_idx=flat_idx,
                      land_mask=jnp.asarray(mask),
                      z_surf=jnp.zeros((ny, nx), jnp.float32),
                      k_lat=1.0e-3, n_padded=ny * nx)
    zwt = jnp.full(ny * nx, 5.0, jnp.float32)
    centre = 3 * nx + 3
    zwt = zwt.at[centre].set(0.5)          # shallow table = high head
    wa = jnp.full(ny * nx, 3000.0, jnp.float32)
    wa1, net = lateral_groundwater_step(wa, zwt, p)
    assert float(net[centre]) < 0.0
    for nb in (centre - 1, centre + 1, centre - nx, centre + nx):
        assert float(net[nb]) > 0.0
    np.testing.assert_allclose(float(jnp.sum(net)), 0.0, atol=1e-3)


def test_outflow_limited_by_store():
    grid, p, wa, zwt = _setup()
    target = grid.n_land // 3
    wa = wa.at[target].set(0.5)           # nearly empty aquifer
    zwt = zwt.at[target].set(0.01)        # but very high head
    wa1, net = lateral_groundwater_step(wa, zwt, p)
    assert float(wa1[target]) >= -1e-5    # cannot go negative
    np.testing.assert_allclose(float(jnp.sum(wa1[:grid.n_land])),
                               float(jnp.sum(wa[:grid.n_land])),
                               rtol=1e-6)


def test_halo_exchange_under_2d_sharding():
    """The stencil gives identical results when the dense grid is block-
    sharded over a 2-D device mesh (rolls become collective-permutes)."""
    grid, p, wa, zwt = _setup()
    ref_wa, ref_net = jax.jit(lateral_groundwater_step)(wa, zwt, p)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("laty", "lonx"))
    grid_sh = NamedSharding(mesh, P("laty", "lonx"))
    p_sh = LateralParams(
        land_flat_idx=p.land_flat_idx,
        land_mask=jax.device_put(p.land_mask, grid_sh),
        z_surf=jax.device_put(p.z_surf, grid_sh),
        k_lat=p.k_lat, n_padded=p.n_padded)
    out_wa, out_net = jax.jit(lateral_groundwater_step)(wa, zwt, p_sh)
    np.testing.assert_allclose(np.asarray(out_wa), np.asarray(ref_wa),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_net), np.asarray(ref_net),
                               rtol=1e-6, atol=1e-5)


def test_sharded_lateral_hlo_contains_halo_collectives():
    """Positive check: under 2-D sharding the stencil compiles to
    collective-permutes (the halo exchange)."""
    import re
    grid, p, wa, zwt = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("laty", "lonx"))
    grid_sh = NamedSharding(mesh, P("laty", "lonx"))
    p_sh = LateralParams(
        land_flat_idx=p.land_flat_idx,
        land_mask=jax.device_put(p.land_mask, grid_sh),
        z_surf=jax.device_put(p.z_surf, grid_sh),
        k_lat=p.k_lat, n_padded=p.n_padded)
    text = jax.jit(lateral_groundwater_step).lower(
        wa, zwt, p_sh).compile().as_text()
    assert re.search(r"collective-permute|all-to-all|all-gather", text), \
        "expected halo communication in the sharded stencil"


def test_day_step_with_lateral():
    import __graft_entry__ as ge
    from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask
    from hybrid9_tpu.physics.lateral import make_lateral_params
    from hybrid9_tpu.step import day_step

    mask = synthetic_land_mask(resolution_deg=12.0, seed=2)
    grid = make_land_grid(mask, 12.0, pad_multiple=64)
    _, state, forcing, params, geom, cfg = ge._build(grid.n_padded)
    lat = make_lateral_params(grid, k_lat=1e-3)
    st, diags = day_step(state, forcing, params, geom, cfg.dt, 8,
                         lateral=lat)
    wa0 = np.asarray(state.soil.wa)
    wa1 = np.asarray(st.soil.wa)
    assert np.all(np.isfinite(wa1))
    # Redistribution happened but land total is conserved up to the
    # day's recharge/drainage fluxes (compare against no-lateral run).
    st2, _ = day_step(state, forcing, params, geom, cfg.dt, 8)
    np.testing.assert_allclose(
        float(wa1[:grid.n_land].sum()),
        float(np.asarray(st2.soil.wa)[:grid.n_land].sum()), rtol=1e-5)
    assert not np.allclose(wa1[:grid.n_land],
                           np.asarray(st2.soil.wa)[:grid.n_land])
