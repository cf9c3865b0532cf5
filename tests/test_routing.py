"""Lateral routed flow: network construction, mass conservation,
sharded execution (new capability beyond the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask
from hybrid9_tpu.grids.routing import build_downstream_index
from hybrid9_tpu.parallel.sharding import CellSharding
from hybrid9_tpu.physics.routing import RoutingParams, route_daily


def _grid():
    mask = synthetic_land_mask(resolution_deg=4.0, seed=1)
    return make_land_grid(mask, 4.0, pad_multiple=64)


def test_downstream_index_valid():
    grid = _grid()
    down = build_downstream_index(grid)
    n = grid.n_padded
    assert down.shape == (n,)
    assert down.min() >= 0 and down.max() <= n
    # No self loops.
    assert not np.any(down[:grid.n_land] == np.arange(grid.n_land))
    # Padding drains to the outlet.
    assert np.all(down[grid.n_land:] == n)
    # A reasonable share of land cells drains to another land cell.
    frac_internal = np.mean(down[:grid.n_land] < n)
    assert frac_internal > 0.3


def test_network_is_acyclic_to_outlet():
    """Following downstream links must always reach the ocean outlet."""
    grid = _grid()
    down = build_downstream_index(grid)
    n = grid.n_padded
    for start in range(0, grid.n_land, 97):
        seen = set()
        i = start
        while i < n:
            assert i not in seen, f"cycle at cell {i}"
            seen.add(i)
            i = int(down[i])
        assert i == n


def test_routing_conserves_mass():
    grid = _grid()
    routing = RoutingParams(
        downstream=jnp.asarray(build_downstream_index(grid), jnp.int32),
        k=0.25)
    n = grid.n_padded
    rng = np.random.RandomState(3)
    store = jnp.asarray(rng.rand(n) * 10.0)
    total_in = 0.0
    total_out = 0.0
    s0 = float(jnp.sum(store))
    for day in range(30):
        local = jnp.asarray(rng.rand(n) * 2.0)
        store, discharge = route_daily(store, local, routing)
        total_in += float(jnp.sum(local))
        total_out += float(jnp.sum(discharge))
    s1 = float(jnp.sum(store))
    np.testing.assert_allclose(s1 - s0, total_in - total_out, rtol=1e-9)
    assert total_out > 0.0
    assert np.all(np.asarray(store) >= 0.0)


def test_routing_under_sharding():
    """The segment-sum lowers correctly over an 8-device cell shard."""
    grid = _grid()
    down = jnp.asarray(build_downstream_index(grid), jnp.int32)
    routing = RoutingParams(downstream=down, k=0.3)
    n = grid.n_padded
    rng = np.random.RandomState(4)
    store = jnp.asarray(rng.rand(n))
    local = jnp.asarray(rng.rand(n))

    ref_store, ref_dis = jax.jit(route_daily)(store, local, routing)

    cs = CellSharding.create()
    sh = NamedSharding(cs.mesh, P(cs.axis))
    store_s = jax.device_put(store, sh)
    local_s = jax.device_put(local, sh)
    down_s = jax.device_put(down, sh)
    out_store, out_dis = jax.jit(route_daily)(
        store_s, local_s, RoutingParams(downstream=down_s, k=0.3))
    np.testing.assert_allclose(np.asarray(out_store),
                               np.asarray(ref_store), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_dis), np.asarray(ref_dis),
                               rtol=1e-6)


def test_day_step_with_routing(layer_grid):
    """day_step threads the river store and reports discharge."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    step_fn, state, forcing, params, geom, cfg = ge._build(256)
    down = np.full(256, 256, np.int64)
    down[:128] = np.arange(128) + 128     # first half drains to second
    routing = RoutingParams(downstream=jnp.asarray(down, jnp.int32),
                            k=0.5)
    st, diags = day_step(state, forcing, params, geom, cfg.dt,
                         cfg.nisurf, routing=routing)
    assert "discharge" in diags
    assert np.all(np.isfinite(np.asarray(st.river_store)))
    # Water entered the network from the day's runoff.
    assert float(jnp.sum(st.river_store)) >= 0.0
