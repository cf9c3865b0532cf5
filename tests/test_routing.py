"""Lateral routed flow: network construction, mass conservation,
sharded execution (new capability beyond the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask
from hybrid9_tpu.grids.routing import (build_downstream_index,
                                       direction_codes, flow_length_m)
from hybrid9_tpu.parallel.sharding import CellSharding
from hybrid9_tpu.physics.routing import (GridKinematicParams,
                                         KinematicParams, RoutingParams,
                                         route_daily, route_kinematic_day,
                                         route_kinematic_day_grid)


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


def _kin_params(grid, **kw):
    down = build_downstream_index(grid)
    return KinematicParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.asarray(flow_length_m(grid, down)), **kw)


def test_flow_length_physical():
    """Hop lengths are one cell size, scaled by cos(lat), sqrt(2) on
    diagonals."""
    grid = _grid()
    down = build_downstream_index(grid)
    length = np.asarray(flow_length_m(grid, down))
    res_m = 4.0 * 6.371e6 * np.pi / 180.0     # 4-degree cells
    # All lengths positive and bounded by one diagonal at the equator.
    assert np.all(length > 0.0)
    assert np.all(length[:grid.n_land] <= res_m * np.sqrt(2.0) * 1.001)
    # Cells at high latitude have shorter E-W hops than equatorial ones.
    lat = grid.cell_lat[:grid.n_land]
    ll = length[:grid.n_land]
    assert ll[np.abs(lat) > 60].mean() < ll[np.abs(lat) < 20].mean()


def test_kinematic_conserves_mass():
    grid = _grid()
    p = _kin_params(grid, n_substeps=6)
    n = grid.n_padded
    rng = np.random.RandomState(5)
    store = jnp.asarray(rng.rand(n) * 10.0)
    step = jax.jit(route_kinematic_day)
    total_in = total_out = 0.0
    s0 = float(jnp.sum(store))
    for day in range(20):
        local = jnp.asarray(rng.rand(n) * 2.0)
        store, dis = step(store, local, p)
        total_in += float(jnp.sum(local))
        total_out += float(jnp.sum(dis))
    s1 = float(jnp.sum(store))
    np.testing.assert_allclose(s1 - s0, total_in - total_out, rtol=1e-6)
    assert total_out > 0.0
    assert np.all(np.asarray(store) >= -1e-7)


def test_kinematic_multi_cell_per_day():
    """A flood pulse traverses n_substeps cells in one day when the CFL
    fraction saturates — the physics the daily linear reservoir cannot
    represent (one cell/day max)."""
    n, m = 16, 8
    down = np.arange(1, n + 1)
    dt_r = 86400.0 / m
    p = KinematicParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.full(n, 0.5 * 3.0 * dt_r, jnp.float32),
        n_substeps=m, c0=100.0)        # clamps at c_max -> f = 1
    store = jnp.zeros(n).at[0].set(7.0)
    s, dis = jax.jit(route_kinematic_day)(store, jnp.zeros(n), p)
    s = np.asarray(s)
    assert s[m] == 7.0 and np.sum(np.abs(s)) == 7.0
    # Low-flow limit: tiny store moves at c_min, much less than a cell.
    p_dry = KinematicParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.full(n, 50000.0, jnp.float32), n_substeps=m)
    s2, _ = jax.jit(route_kinematic_day)(
        jnp.zeros(n).at[0].set(0.01), jnp.zeros(n), p_dry)
    assert np.asarray(s2)[0] > 0.005   # most water stayed put


def test_grid_kinematic_matches_packed():
    """The dense roll/halo formulation is numerically identical to the
    packed segment-sum formulation on the same network."""
    grid = _grid()
    down = build_downstream_index(grid)
    length = flow_length_m(grid, down)
    p_packed = KinematicParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.asarray(length), n_substeps=4)

    codes = direction_codes(grid, down)
    length_g = grid.scatter(length, fill=1.0)
    p_grid = GridKinematicParams(
        dir_code=jnp.asarray(codes),
        flow_length=jnp.asarray(length_g, jnp.float32), n_substeps=4)

    rng = np.random.RandomState(6)
    store = (rng.rand(grid.n_padded) * 10.0).astype(np.float32)
    store[grid.n_land:] = 0.0
    local = (rng.rand(grid.n_padded) * 3.0).astype(np.float32)
    local[grid.n_land:] = 0.0

    s_p, d_p = jax.jit(route_kinematic_day)(
        jnp.asarray(store), jnp.asarray(local), p_packed)

    store_g = grid.scatter(store, fill=0.0)
    local_g = grid.scatter(local, fill=0.0)
    s_g, d_g = jax.jit(route_kinematic_day_grid)(
        jnp.asarray(store_g), jnp.asarray(local_g), p_grid)

    np.testing.assert_allclose(
        np.asarray(s_g.reshape(-1)[grid.land_idx]),
        np.asarray(s_p)[:grid.n_land], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(jnp.sum(d_g)), float(jnp.sum(d_p)), rtol=1e-5)


def test_grid_muskingum_matches_packed():
    """The dense roll/halo form of the Muskingum-Cunge router is
    numerically identical to the packed segment-sum form on the same
    network and per-reach geometry."""
    from hybrid9_tpu.grids.routing import (bankfull_width_m,
                                           cell_area_m2,
                                           flow_accumulation,
                                           reach_slope)
    from hybrid9_tpu.physics.routing import (GridMuskingumParams,
                                             route_muskingum_day,
                                             route_muskingum_day_grid)

    grid = _grid()
    p_packed = _mc_params(grid, n_substeps=4)
    down = build_downstream_index(grid)
    acc = flow_accumulation(grid, down)
    p_grid = GridMuskingumParams(
        dir_code=jnp.asarray(direction_codes(grid, down)),
        flow_length=jnp.asarray(
            grid.scatter(flow_length_m(grid, down), fill=1.0),
            jnp.float32),
        slope=jnp.asarray(grid.scatter(reach_slope(grid, down),
                                       fill=1.0e-3), jnp.float32),
        width=jnp.asarray(grid.scatter(bankfull_width_m(acc), fill=1.0),
                          jnp.float32),
        cell_area=jnp.asarray(grid.scatter(cell_area_m2(grid), fill=1.0),
                              jnp.float32),
        n_substeps=4)

    rng = np.random.RandomState(9)
    store = (rng.rand(grid.n_padded) * 10.0).astype(np.float32)
    store[grid.n_land:] = 0.0
    local = (rng.rand(grid.n_padded) * 3.0).astype(np.float32)
    local[grid.n_land:] = 0.0

    s_p, d_p = jax.jit(route_muskingum_day)(
        jnp.asarray(store), jnp.asarray(local),
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if a.dtype == jnp.float64 else a, p_packed))

    store_g = grid.scatter(store, fill=0.0)
    local_g = grid.scatter(local, fill=0.0)
    s_g, d_g = jax.jit(route_muskingum_day_grid)(
        jnp.asarray(store_g), jnp.asarray(local_g), p_grid)

    np.testing.assert_allclose(
        np.asarray(s_g.reshape(-1)[grid.land_idx]),
        np.asarray(s_p)[:grid.n_land], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(d_g)), float(jnp.sum(d_p)), rtol=1e-5)
    # Mass closes identically in both forms.
    np.testing.assert_allclose(
        float(jnp.sum(s_g) + jnp.sum(d_g)),
        float(np.sum(store) + np.sum(local)), rtol=1e-5)


def test_grid_routers_tolerate_nan_fill_values():
    """The dense forms use mask-MULTIPLY algebra (hoisted f32 weights),
    so a NaN fill value on a non-land cell would poison a land
    neighbour's inflow (0 * NaN = NaN) unless the off-land hydraulic
    fields are sanitised.  LandGrid.scatter's DEFAULT fill is NaN —
    a direct constructor must survive it."""
    from hybrid9_tpu.grids.routing import (bankfull_width_m,
                                           cell_area_m2,
                                           flow_accumulation,
                                           reach_slope)
    from hybrid9_tpu.physics.routing import (GridKinematicParams,
                                             GridMuskingumParams,
                                             route_kinematic_day_grid,
                                             route_muskingum_day_grid)

    grid = _grid()
    down = build_downstream_index(grid)
    codes = jnp.asarray(direction_codes(grid, down))
    nanfill = dict(fill=np.nan)
    length_g = jnp.asarray(
        grid.scatter(flow_length_m(grid, down), **nanfill), jnp.float32)
    acc = flow_accumulation(grid, down)
    p_kin = GridKinematicParams(dir_code=codes, flow_length=length_g,
                                n_substeps=4)
    p_mc = GridMuskingumParams(
        dir_code=codes, flow_length=length_g,
        slope=jnp.asarray(grid.scatter(reach_slope(grid, down),
                                       **nanfill), jnp.float32),
        width=jnp.asarray(grid.scatter(bankfull_width_m(acc), **nanfill),
                          jnp.float32),
        cell_area=jnp.asarray(grid.scatter(cell_area_m2(grid),
                                           **nanfill), jnp.float32),
        n_substeps=4)

    rng = np.random.RandomState(12)
    store = grid.scatter(
        (rng.rand(grid.n_padded) * 10.0).astype(np.float32), fill=0.0)
    local = grid.scatter(
        (rng.rand(grid.n_padded) * 2.0).astype(np.float32), fill=0.0)
    land = np.asarray(codes) >= 0
    for route, p in ((route_kinematic_day_grid, p_kin),
                     (route_muskingum_day_grid, p_mc)):
        s, d = jax.jit(route)(jnp.asarray(store), jnp.asarray(local), p)
        assert np.all(np.isfinite(np.asarray(s)[land])), route.__name__
        assert np.all(np.isfinite(np.asarray(d)[land])), route.__name__
        # Mass still closes over land.
        np.testing.assert_allclose(
            float(jnp.sum(jnp.where(jnp.asarray(land), s, 0.0))
                  + jnp.sum(jnp.where(jnp.asarray(land), d, 0.0))),
            float(store.sum() + local.sum()), rtol=1e-5)


def test_grid_kinematic_2d_sharded_halo():
    """Under a 2-D (lat, lon) block sharding the dense router exchanges
    water through collective-permute halos and matches the unsharded
    result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # 2-degree grid: [90, 180] divides the (2, 4) device mesh evenly.
    mask = synthetic_land_mask(resolution_deg=2.0, seed=1)
    grid = make_land_grid(mask, 2.0, pad_multiple=64)
    down = build_downstream_index(grid)
    codes = direction_codes(grid, down)
    length_g = grid.scatter(flow_length_m(grid, down), fill=1.0)
    p = GridKinematicParams(
        dir_code=jnp.asarray(codes),
        flow_length=jnp.asarray(length_g, jnp.float32), n_substeps=4)

    rng = np.random.RandomState(7)
    store = grid.scatter(
        (rng.rand(grid.n_padded) * 10.0).astype(np.float32), fill=0.0)
    local = grid.scatter(
        (rng.rand(grid.n_padded) * 2.0).astype(np.float32), fill=0.0)
    ref_s, ref_d = jax.jit(route_kinematic_day_grid)(
        jnp.asarray(store), jnp.asarray(local), p)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("lat", "lon"))
    sh = NamedSharding(mesh, P("lat", "lon"))
    args = (jax.device_put(jnp.asarray(store), sh),
            jax.device_put(jnp.asarray(local), sh),
            GridKinematicParams(
                dir_code=jax.device_put(p.dir_code, sh),
                flow_length=jax.device_put(p.flow_length, sh),
                n_substeps=4))
    fn = jax.jit(route_kinematic_day_grid)
    hlo = fn.lower(*args).compile().as_text()
    assert "collective-permute" in hlo, (
        "2-D sharded routing should lower rolls to halo exchanges")
    s, d = fn(*args)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-6)


def test_day_step_with_kinematic_routing(layer_grid):
    """day_step dispatches KinematicParams through _route."""
    import __graft_entry__ as ge
    from hybrid9_tpu.step import day_step

    step_fn, state, forcing, params, geom, cfg = ge._build(256)
    down = np.full(256, 256, np.int64)
    down[:255] = np.arange(255) + 1
    routing = KinematicParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.full(256, 50000.0, jnp.float32), n_substeps=4)
    st, diags = day_step(state, forcing, params, geom, cfg.dt,
                         cfg.nisurf, routing=routing)
    assert "discharge" in diags
    assert np.all(np.isfinite(np.asarray(st.river_store)))


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


def test_reach_geometry_builders():
    """Slope/area/accumulation/width builders produce physical values."""
    from hybrid9_tpu.grids.routing import (bankfull_width_m, cell_area_m2,
                                           flow_accumulation, reach_slope)

    grid = _grid()
    down = build_downstream_index(grid)
    n = grid.n_land

    area = cell_area_m2(grid)
    res_m = 4.0 * 6.371e6 * np.pi / 180.0
    assert np.all(area[:n] > 0.0)
    assert np.all(area[:n] <= res_m * res_m * 1.001)

    slope = reach_slope(grid, down)
    assert np.all(slope >= 1e-5) and np.all(slope <= 0.1)

    acc = flow_accumulation(grid, down)
    # Every cell drains at least its own area, and a downstream cell
    # accumulates at least everything its upstream neighbour did.
    assert np.all(acc[:n] >= area[:n] * 0.999)
    internal = down[:n] < n
    di = down[:n][internal]
    assert np.all(acc[di] >= acc[:n][internal] * 0.999)
    # Each cell's area reaches exactly one outlet-draining cell: the
    # accumulated area at outlet cells sums to the total land area.
    outlet = ~internal
    np.testing.assert_allclose(acc[:n][outlet].sum(),
                               area[:n].sum(), rtol=1e-5)

    width = bankfull_width_m(acc)
    assert np.all(width >= 5.0) and np.all(width <= 3000.0)
    # Wider channels where more area has accumulated.
    assert width[:n][acc[:n] > np.median(acc[:n])].mean() >= \
        width[:n][acc[:n] <= np.median(acc[:n])].mean()


def _mc_params(grid, **kw):
    from hybrid9_tpu.grids.routing import (bankfull_width_m, cell_area_m2,
                                           flow_accumulation, reach_slope)
    from hybrid9_tpu.physics.routing import MuskingumParams

    down = build_downstream_index(grid)
    return MuskingumParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.asarray(flow_length_m(grid, down)),
        slope=jnp.asarray(reach_slope(grid, down)),
        width=jnp.asarray(bankfull_width_m(flow_accumulation(grid, down))),
        cell_area=jnp.asarray(cell_area_m2(grid)), **kw)


def test_muskingum_conserves_mass():
    from hybrid9_tpu.physics.routing import route_muskingum_day

    grid = _grid()
    p = _mc_params(grid, n_substeps=6)
    n = grid.n_padded
    rng = np.random.RandomState(8)
    store = jnp.asarray(rng.rand(n) * 10.0)
    step = jax.jit(route_muskingum_day)
    total_in = total_out = 0.0
    s0 = float(jnp.sum(store))
    for day in range(20):
        local = jnp.asarray(rng.rand(n) * 2.0)
        store, dis = step(store, local, p)
        total_in += float(jnp.sum(local))
        total_out += float(jnp.sum(dis))
    s1 = float(jnp.sum(store))
    np.testing.assert_allclose(s1 - s0, total_in - total_out, rtol=1e-5)
    assert total_out > 0.0
    assert np.all(np.asarray(store) >= -1e-6)


def test_muskingum_translates_and_attenuates():
    """A flood pulse on a uniform chain moves downstream AND spreads —
    the diffusive behaviour the pure kinematic scheme lacks."""
    from hybrid9_tpu.physics.routing import (MuskingumParams,
                                             route_muskingum_day)

    n, m = 32, 8
    down = np.arange(1, n + 1)
    # Flat lowland river (slope 1e-4) with a deep 20 mm flood wave:
    # here the Cunge X sits well below 1/2, so the wave must diffuse.
    p = MuskingumParams(
        downstream=jnp.asarray(down, jnp.int32),
        flow_length=jnp.full(n, 20000.0, jnp.float32),
        slope=jnp.full(n, 1e-4, jnp.float32),
        width=jnp.full(n, 50.0, jnp.float32),
        cell_area=jnp.full(n, 1.0e8, jnp.float32),   # ~10 km cells
        n_substeps=m)
    store = jnp.zeros(n).at[2].set(20.0)             # 20 mm pulse
    step = jax.jit(route_muskingum_day)
    for day in range(3):
        store, dis = step(store, jnp.zeros(n), p)
    s = np.asarray(store)
    # Mass still in the chain (pulse hasn't reached the outlet yet) ...
    np.testing.assert_allclose(s.sum(), 20.0, rtol=1e-5)
    # ... the peak moved downstream of the injection cell ...
    assert int(np.argmax(s)) > 2
    # ... and attenuated while spreading over multiple cells.
    assert s.max() < 10.0
    assert np.sum(s > 0.01 * s.max()) >= 5


def test_muskingum_wiring(tmp_path):
    """Simulation builds MuskingumParams for routing_scheme='muskingum'
    and a day step runs conservatively through it."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.physics.routing import MuskingumParams
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=30, cell_block=32, nisurf=8,
                 output_path=str(tmp_path), use_pallas=False,
                 routing_scheme="muskingum", routing_substeps=4,
                 routing_form="packed")
    grid, params = load_soil(cfg)
    sim = Simulation(cfg, params, land_grid=grid)
    assert isinstance(sim.routing, MuskingumParams)
    provider = SyntheticForcingProvider(
        grid.n_padded, seed=11, lat=grid.cell_lat, dtype=jnp.float32)
    results = sim.run(provider)
    assert float(np.max(results[0]["max_abs_residual"])) < 0.1
    assert float(np.sum(results[0]["discharge"])) > 0.0


def test_muskingum_zero_slope_no_nan():
    """A reach with slope=0 and an empty store must not produce NaN:
    the router clamps the slope internally (direct MuskingumParams
    constructors bypass reach_slope's 1e-5 floor)."""
    from hybrid9_tpu.physics.routing import (MuskingumParams,
                                             route_muskingum_day)

    n = 4
    down = jnp.asarray([1, 2, 3, n], jnp.int32)
    p = MuskingumParams(
        downstream=down,
        flow_length=jnp.full((n,), 5.0e4),
        slope=jnp.zeros((n,)),               # flat — the hazardous case
        width=jnp.full((n,), 50.0),
        cell_area=jnp.full((n,), 2.0e9),
        n_substeps=4)
    store = jnp.zeros((n,))                  # empty store too
    local = jnp.zeros((n,))
    s, dis = route_muskingum_day(store, local, p)
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.all(np.isfinite(np.asarray(dis)))
    # And with water present it still conserves mass.
    s, dis = route_muskingum_day(jnp.full((n,), 5.0),
                                 jnp.full((n,), 1.0), p)
    assert np.all(np.isfinite(np.asarray(s)))
    np.testing.assert_allclose(float(jnp.sum(s)) + float(jnp.sum(dis)),
                               4 * 5.0 + 4 * 1.0, rtol=1e-5)


def test_downstream_from_flowdir_esri_codes():
    """Hand-built ESRI D8 field: codes map to the right neighbours,
    ocean/off-grid/zero-coded receivers drain to the outlet."""
    from hybrid9_tpu.grids.routing import downstream_from_flowdir

    ny, nx = 4, 6
    mask = np.zeros((ny, nx), bool)
    mask[1, 1:4] = True      # a west-east chain
    mask[2, 2] = True        # one cell below the chain middle
    grid = make_land_grid(mask, 30.0, pad_multiple=8)
    packed = {tuple(divmod(int(f), nx)): i
              for i, f in enumerate(grid.land_idx)}

    fd = np.zeros((ny, nx))
    fd[1, 1] = 1             # E  -> (1, 2)
    fd[1, 2] = 1             # E  -> (1, 3)
    fd[1, 3] = 8             # SW -> (2, 2)
    fd[2, 2] = 4             # S  -> (3, 2) = ocean -> outlet
    down = downstream_from_flowdir(grid, fd)
    assert down[packed[(1, 1)]] == packed[(1, 2)]
    assert down[packed[(1, 2)]] == packed[(1, 3)]
    assert down[packed[(1, 3)]] == packed[(2, 2)]
    assert down[packed[(2, 2)]] == grid.n_padded

    # Longitude wrap: a cell at x=0 flowing W receives x=nx-1.
    mask2 = np.zeros((ny, nx), bool)
    mask2[1, 0] = True
    mask2[1, nx - 1] = True
    grid2 = make_land_grid(mask2, 30.0, pad_multiple=8)
    fd2 = np.zeros((ny, nx))
    fd2[1, 0] = 16           # W -> wraps to (1, nx-1)
    down2 = downstream_from_flowdir(grid2, fd2)
    p2 = {tuple(divmod(int(f), nx)): i
          for i, f in enumerate(grid2.land_idx)}
    assert down2[p2[(1, 0)]] == p2[(1, nx - 1)]


def test_load_network_from_file(tmp_path):
    """A 'real-format' network NetCDF (elevation and/or flowdir) drives
    the D8 build; elevation-only matches build_downstream_index."""
    from hybrid9_tpu.grids.grid import cell_centres
    from hybrid9_tpu.grids.routing import (load_network,
                                           synthetic_elevation)
    from hybrid9_tpu.io.netcdf import write_grid_file

    grid = _grid()
    land = np.zeros(grid.ny * grid.nx, bool)
    land[grid.land_idx] = True
    elev = synthetic_elevation(land.reshape(grid.ny, grid.nx), seed=9)
    lon, lat = cell_centres(4.0)

    path = str(tmp_path / "network.nc")
    write_grid_file(path, {"elevation": elev}, lon, lat,
                    units={"elevation": "m"})
    down, elev_back = load_network(grid, path)
    expect = build_downstream_index(grid, elevation=elev)
    np.testing.assert_array_equal(down, expect)
    np.testing.assert_allclose(elev_back, elev, rtol=1e-6)

    # flowdir takes precedence over elevation for topology.
    from hybrid9_tpu.grids.routing import (direction_codes as dc,
                                           downstream_from_flowdir)
    codes = dc(grid, expect)
    # Convert our 0..7 codes to ESRI power-of-two codes.
    esri_of = {(-1, -1): 32, (-1, 0): 64, (-1, 1): 128, (0, -1): 16,
               (0, 1): 1, (1, -1): 8, (1, 0): 4, (1, 1): 2}
    d8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
          (1, 1)]
    fd = np.zeros_like(codes, dtype=np.float64)
    for k, off in enumerate(d8):
        fd[codes == k] = esri_of[off]
    path2 = str(tmp_path / "network_fd.nc")
    write_grid_file(path2, {"flowdir": fd, "elevation": elev}, lon, lat)
    down2, _ = load_network(grid, path2)
    np.testing.assert_array_equal(down2, downstream_from_flowdir(grid, fd))
    # Same topology as the elevation build (codes came from it).
    np.testing.assert_array_equal(down2, expect)


def test_simulation_with_network_file(tmp_path):
    """Config.routing_network_path drives the Muskingum build and the
    year conserves mass (VERDICT round-1 item 7)."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.grids.grid import cell_centres
    from hybrid9_tpu.grids.routing import synthetic_elevation
    from hybrid9_tpu.io.netcdf import write_grid_file
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=12.0, start_year=1901, end_year=1901,
                 forcing_block_days=30, cell_block=32, nisurf=8,
                 output_path=str(tmp_path), use_pallas=False,
                 write_annual=False,
                 routing_scheme="muskingum", routing_substeps=4)
    grid, params = load_soil(cfg)
    land = np.zeros(grid.ny * grid.nx, bool)
    land[grid.land_idx] = True
    elev = synthetic_elevation(land.reshape(grid.ny, grid.nx), seed=21)
    lon, lat = cell_centres(12.0)
    path = str(tmp_path / "net.nc")
    write_grid_file(path, {"elevation": elev}, lon, lat)

    cfg = Config(**{**cfg.__dict__, "routing_network_path": path})
    sim = Simulation(cfg, params, land_grid=grid)
    provider = SyntheticForcingProvider(grid.n_padded, seed=11,
                                        lat=grid.cell_lat)
    results = sim.run(provider)
    assert float(np.max(results[0]["max_abs_residual"][:grid.n_land])) \
        < 0.1
    assert float(np.sum(results[0]["discharge"])) > 0.0


def test_flowdir_cycles_broken():
    """A raw D8 product with a 2-cell cycle: the cycle members are
    redirected to the outlet, the chain upstream of them keeps its real
    topology, and flow accumulation sees every cell."""
    from hybrid9_tpu.grids.routing import (downstream_from_flowdir,
                                           flow_accumulation)

    ny, nx = 4, 6
    mask = np.zeros((ny, nx), bool)
    mask[1, 1:5] = True          # chain of 4 cells
    grid = make_land_grid(mask, 30.0, pad_multiple=8)
    packed = {tuple(divmod(int(f), nx)): i
              for i, f in enumerate(grid.land_idx)}

    fd = np.zeros((ny, nx))
    fd[1, 1] = 1                 # E -> (1, 2): real upstream topology
    fd[1, 2] = 1                 # E -> (1, 3)
    fd[1, 3] = 1                 # E -> (1, 4)   } 2-cell cycle
    fd[1, 4] = 16                # W -> (1, 3)   }
    down = downstream_from_flowdir(grid, fd)
    # Upstream chain intact.
    assert down[packed[(1, 1)]] == packed[(1, 2)]
    assert down[packed[(1, 2)]] == packed[(1, 3)]
    # Cycle members drain to the outlet.
    cyc = {int(down[packed[(1, 3)]]), int(down[packed[(1, 4)]])}
    assert cyc == {grid.n_padded}
    # Kahn accumulation now reaches every cell: the cycle head's area
    # includes the whole upstream chain.
    acc = flow_accumulation(grid, down)
    area = np.asarray(acc[:grid.n_land])
    assert area[packed[(1, 3)]] >= 3 * area[packed[(1, 1)]] * 0.99


def test_flowdir_only_slope_uses_flints_law(tmp_path):
    """A network file with flowdir but NO elevation must not fabricate
    Muskingum slopes from synthetic terrain: slopes follow the
    slope-area relation on the real topology (big rivers flatter)."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.grids.grid import cell_centres
    from hybrid9_tpu.grids.routing import (downstream_from_flowdir,
                                           flow_accumulation,
                                           slope_from_accumulation)
    from hybrid9_tpu.io.netcdf import write_grid_file
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=12.0, cell_block=32,
                 routing_scheme="muskingum", use_pallas=False,
                 routing_form="packed")
    grid, params = load_soil(cfg)
    # Build a flowdir field from the synthetic topology, then strip the
    # elevation so only the direction codes survive in the file.
    from hybrid9_tpu.grids.routing import (build_downstream_index,
                                           direction_codes,
                                           synthetic_elevation)
    land = np.zeros(grid.ny * grid.nx, bool)
    land[grid.land_idx] = True
    elev = synthetic_elevation(land.reshape(grid.ny, grid.nx), seed=0)
    expect = build_downstream_index(grid, elevation=elev)
    codes = direction_codes(grid, expect)
    esri_of = {(-1, -1): 32, (-1, 0): 64, (-1, 1): 128, (0, -1): 16,
               (0, 1): 1, (1, -1): 8, (1, 0): 4, (1, 1): 2}
    d8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
          (1, 1)]
    fd = np.zeros_like(codes, dtype=np.float64)
    for k, off in enumerate(d8):
        fd[codes == k] = esri_of[off]
    lon, lat = cell_centres(cfg.resolution_deg)
    path = str(tmp_path / "fd_only.nc")
    write_grid_file(path, {"flowdir": fd}, lon, lat)

    cfg = Config(**{**cfg.__dict__, "routing_network_path": path})
    sim = Simulation(cfg, params, land_grid=grid)
    got = np.asarray(sim.routing.slope)
    down = downstream_from_flowdir(grid, fd)
    want = slope_from_accumulation(flow_accumulation(grid, down))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Physically ordered: the largest-area cell is not steeper than the
    # smallest-area one.
    acc = np.asarray(flow_accumulation(grid, down)[:grid.n_land])
    s = got[:grid.n_land]
    assert s[np.argmax(acc)] <= s[np.argmin(acc)]


def test_grid_routing_form_production_path():
    """``Config.routing_form='grid'`` builds the halo-exchange router in
    Simulation and its annual discharge matches ``routing_form='packed'``
    on the same network (the production promotion of the router-level
    equivalence above)."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.physics.routing import GridRouting
    from hybrid9_tpu.run import Simulation

    base = dict(resolution_deg=12.0, start_year=1901, end_year=1901,
                forcing_block_days=366, cell_block=32, nisurf=4,
                use_pallas=False, frozen_soil=False, snow=False,
                lateral_groundwater=False)
    for scheme in ("kinematic", "muskingum"):
        results = {}
        for form in ("packed", "grid"):
            cfg = Config(**base, routing_scheme=scheme,
                         routing_form=form)
            grid, params = load_soil(cfg)
            provider = SyntheticForcingProvider(grid.n_padded, seed=4,
                                                lat=grid.cell_lat)
            sim = Simulation(cfg, params, land_grid=grid)
            if form == "grid":
                assert isinstance(sim.routing, GridRouting)
            m = sim.run_year(1901, provider)
            results[form] = m["discharge"][:grid.n_land]
        np.testing.assert_allclose(results["grid"], results["packed"],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=scheme)


def test_grid_routing_form_requires_subdaily_scheme():
    """The dense form exists for the sub-daily routers only; an explicit
    grid+linear request is a config error (the 'auto' default resolves
    linear to packed instead)."""
    import pytest

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=12.0, cell_block=32, use_pallas=False,
                 routing_scheme="linear", routing_form="grid")
    grid, params = load_soil(cfg)
    with pytest.raises(ValueError, match="routing_form='grid'"):
        Simulation(cfg, params, land_grid=grid)
    # 'auto' + linear builds the packed daily reservoir, no error.
    from hybrid9_tpu.physics.routing import RoutingParams
    cfg2 = Config(resolution_deg=12.0, cell_block=32, use_pallas=False,
                  routing_scheme="linear")
    grid2, params2 = load_soil(cfg2)
    sim = Simulation(cfg2, params2, land_grid=grid2)
    assert isinstance(sim.routing, RoutingParams)


def test_routers_honor_negative_runoff_reclaim():
    """Drainage-fixup days hand the router NEGATIVE local runoff (the
    reference takes unmet soil deficits back out of drainage,
    HYDROLOGY.f90:1204-1211).  The router must conserve that by
    debiting the store — transient micro-negative balances bounded by
    the reclaim, never amplified — and the non-negative-path update
    order must keep ordinary stores from rounding below zero (r5)."""
    from hybrid9_tpu.physics.routing import (route_daily,
                                             route_kinematic_day,
                                             route_muskingum_day)

    grid = _grid()
    n = grid.n_padded
    rng = np.random.RandomState(5)
    routers = [
        (route_daily, RoutingParams(
            downstream=jnp.asarray(build_downstream_index(grid),
                                   jnp.int32), k=0.25)),
        (route_kinematic_day, _kin_params(grid, n_substeps=4)),
        (route_muskingum_day, _mc_params(grid, n_substeps=4)),
    ]
    for route, p in routers:
        step = jax.jit(route)
        store = jnp.asarray(rng.rand(n) * 1.0e-3)   # nearly-empty rivers
        s0 = float(jnp.sum(store))
        total_in = total_out = 0.0
        for day in range(15):
            local = jnp.asarray(rng.rand(n) * 2.0e-4 - 1.0e-4)
            store, dis = step(store, local, p)
            total_in += float(jnp.sum(local))
            total_out += float(jnp.sum(dis))
        s = np.asarray(store)
        # Conserves through the reclaim days...
        np.testing.assert_allclose(
            float(jnp.sum(store)) - s0, total_in - total_out,
            rtol=1e-4, atol=1e-6)
        # ...and any negative balance stays micro (bounded by the
        # cumulative reclaim, 15 days x 1e-4 mm), not amplified.
        assert np.min(s) > -2.0e-3, np.min(s)
        assert np.all(np.asarray(dis) >= 0.0)
