"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates the TPU-native analog of the reference's MPI domain
decomposition (SURVEY.md C13/C14): the day step jits and runs under a
cell-axis NamedSharding, results are independent of device count, and the
graft entry points compile.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.data.synthetic import (synthetic_forcing_day,
                                        synthetic_soil_params)
from hybrid9_tpu.parallel.sharding import CellSharding
from hybrid9_tpu.physics.hydrology import Geometry
from hybrid9_tpu.state import Forcing, SoilParams, initial_state
from hybrid9_tpu.step import day_step


def _setup(n, dtype=jnp.float32, layer_grid=None):
    raw = synthetic_soil_params(n, seed=0)
    params = SoilParams(**{k: jnp.asarray(v, dtype)
                           for k, v in raw.items()})
    state = initial_state(params, layer_grid.dz, layer_grid.zi, dtype)
    geom = Geometry.from_layer_grid(layer_grid, dtype)
    day = synthetic_forcing_day(n, 180, seed=2)
    forcing = Forcing(**{k: jnp.asarray(v, dtype) for k, v in day.items()})
    return params, state, geom, forcing


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8, (
        "conftest should provide 8 virtual CPU devices")


def test_day_step_under_cell_sharding(layer_grid):
    n = 8 * 16
    params, state, geom, forcing = _setup(n, layer_grid=layer_grid)
    cs = CellSharding.create()
    cs.check_divisible(n)

    state_sh = cs.put(state)
    params_sh = cs.put(params)
    forcing_sh = cs.put(forcing)

    step = jax.jit(lambda s, f: day_step(s, f, params_sh, geom,
                                         1800.0, 48))
    out_sh, diags_sh = step(state_sh, forcing_sh)
    # Output keeps the cell sharding (no implicit all-gather).
    shard_shapes = {d.data.shape[0]
                    for d in out_sh.soil.h2osoi_liq.addressable_shards}
    assert shard_shapes == {n // cs.n_devices}

    # Replicated single-device run gives the same physics.  Sharded vs
    # unsharded compilations fuse differently, so f32 round-off differs
    # at ~1e-4 relative over 48 substeps; that is the tolerance here.
    step1 = jax.jit(lambda s, f: day_step(s, f, params, geom, 1800.0, 48))
    out1, diags1 = step1(state, forcing)
    np.testing.assert_allclose(np.asarray(out_sh.soil.h2osoi_liq),
                               np.asarray(out1.soil.h2osoi_liq),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_sh.veg.lai),
                               np.asarray(out1.veg.lai), rtol=5e-4,
                               atol=1e-5)


def test_global_diag_reduction_under_sharding(layer_grid):
    """Cross-cell reductions (the psum analog) work over the mesh."""
    n = 8 * 8
    params, state, geom, forcing = _setup(n, layer_grid=layer_grid)
    cs = CellSharding.create()
    state_sh = cs.put(state)

    @jax.jit
    def total_water(s):
        return jnp.sum(s.soil.h2osoi_liq) + jnp.sum(s.soil.wa)

    t_sh = float(total_water(state_sh))
    t_1 = float(total_water(state))
    np.testing.assert_allclose(t_sh, t_1, rtol=1e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


def test_day_step_pallas_under_mesh(layer_grid):
    """The production dispatch path: day_step with a mesh + use_pallas
    routes through the shard_map'd Pallas kernel and matches the XLA
    scan path (VERDICT round-1 item 1: the Pallas speed must survive
    the sharded flagship configuration)."""
    n = 8 * 256
    params, state, geom, forcing = _setup(n, layer_grid=layer_grid)
    cs = CellSharding.create()
    state_sh = cs.put(state)
    params_sh = cs.put(params)
    forcing_sh = cs.put(forcing)

    step = jax.jit(lambda s, f: day_step(
        s, f, params_sh, geom, 1800.0, 48, use_pallas=True,
        pallas_block=256, mesh=cs.mesh, pallas_interpret=True))
    out_sh, diags_sh = step(state_sh, forcing_sh)
    # Output keeps the cell sharding.
    shard_shapes = {d.data.shape[0]
                    for d in out_sh.soil.h2osoi_liq.addressable_shards}
    assert shard_shapes == {n // cs.n_devices}

    step1 = jax.jit(lambda s, f: day_step(s, f, params, geom, 1800.0, 48))
    out1, _ = step1(state, forcing)
    np.testing.assert_allclose(np.asarray(out_sh.soil.h2osoi_liq),
                               np.asarray(out1.soil.h2osoi_liq),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_sh.soil.zwt),
                               np.asarray(out1.soil.zwt),
                               rtol=5e-4, atol=1e-4)
    assert float(jnp.max(diags_sh["max_abs_residual"])) < 0.1


def test_simulation_block_step_pallas_sharded(layer_grid):
    """Simulation with sharding + use_pallas runs a forcing block through
    the shard_map'd kernel end-to-end (the --shard production path)."""
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=8.0, start_year=1901, end_year=1901,
                 forcing_block_days=10, cell_block=512, nisurf=8,
                 use_pallas=True, pallas_block=64, pallas_interpret=True,
                 write_annual=False)
    grid, params = load_soil(cfg)
    cs = CellSharding.create()
    cs.check_divisible(grid.n_padded)
    sim = Simulation(cfg, params, sharding=cs, land_grid=grid)
    assert sim.use_pallas and sim.mesh is not None
    provider = SyntheticForcingProvider(grid.n_padded, seed=3,
                                        lat=grid.cell_lat)
    means = sim.run_year(1901, provider, block_days=10)
    assert float(np.max(means["max_abs_residual"][:grid.n_land])) < 0.1

    # Same run, unsharded XLA path: annual means must agree.
    cfg2 = Config(**{**cfg.__dict__, "use_pallas": False,
                     "pallas_interpret": False})
    sim2 = Simulation(cfg2, params, land_grid=grid)
    means2 = sim2.run_year(1901, provider, block_days=10)
    nl = grid.n_land
    np.testing.assert_allclose(means["theta_total"][:nl],
                               means2["theta_total"][:nl],
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(means["evap"][:nl], means2["evap"][:nl],
                               rtol=5e-3, atol=1e-6)
