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


def _da_setup(layer_grid, n, ndays, nisurf, seed=3):
    """Params, state, geom, stacked [days, n] forcing + twin obs."""
    from hybrid9_tpu.calibrate import simulate_daily_et
    params, state0, geom, _ = _setup(n, layer_grid=layer_grid)
    fields = ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs")
    days = [synthetic_forcing_day(n, d + 1, seed=seed)
            for d in range(ndays)]
    forcing = Forcing(**{k: jnp.stack([jnp.asarray(d[k], jnp.float32)
                                       for d in days]) for k in fields})
    true_theta = {"hksat": jnp.full((), 0.7, jnp.float32)}
    obs = simulate_daily_et(true_theta, params, state0, forcing, geom,
                            nisurf)
    return params, state0, geom, forcing, obs


def test_assimilate_sharded_matches_unsharded(layer_grid):
    """The sequential EnSRF under the 8-device cell sharding equals the
    single-device run: the cell-major fold makes every analysis
    quantity device-local (VERDICT r4 item 1)."""
    from hybrid9_tpu.assimilate import assimilate

    n, ndays, nisurf = 8 * 16, 6, 4
    params, state0, geom, forcing, obs = _da_setup(layer_grid, n,
                                                   ndays, nisurf)
    kw = dict(n_members=6, nisurf=nisurf, seed=1, theta_spread=0.3)
    r0 = assimilate(params, state0, forcing, obs, geom, **kw)
    cs = CellSharding.create()
    r1 = assimilate(params, state0, forcing, obs, geom, **kw,
                    sharding=cs)
    # Posterior stays sharded on the mesh (no implicit gather).
    assert r1["theta_mean"].sharding.spec == jax.sharding.PartitionSpec(
        "cells")
    np.testing.assert_allclose(np.asarray(r1["theta_mean"]),
                               np.asarray(r0["theta_mean"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1["y_pred_mean"]),
                               np.asarray(r0["y_pred_mean"]),
                               rtol=2e-4, atol=2e-4)


def test_assimilate_sharded_pallas_path(layer_grid):
    """Sharded DA with use_pallas dispatches the forecast through the
    shard_map'd Pallas day kernel (interpret mode on CPU) and agrees
    with the sharded XLA path to kernel parity tolerance."""
    from hybrid9_tpu.assimilate import assimilate

    n, ndays, nisurf = 8 * 16, 3, 4
    params, state0, geom, forcing, obs = _da_setup(layer_grid, n,
                                                   ndays, nisurf)
    cs = CellSharding.create()
    kw = dict(n_members=4, nisurf=nisurf, seed=1, sharding=cs)
    r_xla = assimilate(params, state0, forcing, obs, geom, **kw)
    r_pal = assimilate(params, state0, forcing, obs, geom, **kw,
                       use_pallas=True, pallas_block=16,
                       pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(r_pal["theta_mean"]),
                               np.asarray(r_xla["theta_mean"]),
                               rtol=5e-3, atol=5e-4)


def test_assimilate_sharded_cycle_no_collectives(layer_grid):
    """Compiled-HLO audit: the full sharded forecast+analysis cycle
    contains ZERO cross-device communication — the DA inherits the
    model's cell-local scaling (assimilate.py module docstring)."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from hybrid9_tpu.assimilate import EnKFConfig, _enkf_cycle
    from hybrid9_tpu.physics import constants as c

    COLL = re.compile(
        r"all-reduce|all-gather|all-to-all|collective-permute|"
        r"reduce-scatter|collective-broadcast")
    n, m = 8 * 16, 4
    params, state0, geom, forcing = _setup(n, layer_grid=layer_grid)
    cs = CellSharding.create()

    def fold(x):
        return jnp.repeat(x, m, axis=0)

    params_t = cs.put(jax.tree_util.tree_map(fold, params))
    state_m = cs.put(jax.tree_util.tree_map(
        lambda x: fold(x) if (hasattr(x, "ndim") and x.ndim >= 1
                              and x.shape[0] == n) else x, state0))
    theta = jax.device_put(jnp.zeros((m, n), jnp.float32),
                           NamedSharding(cs.mesh, P(None, "cells")))
    f = cs.put(forcing)
    obs = cs.put(jnp.ones((n,), jnp.float32))
    mask = cs.put(jnp.ones((n,), bool))
    lowered = _enkf_cycle.lower(
        state_m, theta, params_t, f, obs, mask, geom, c.SDAY / 4, m, 4,
        True, False, 1024, 1, EnKFConfig())
    hits = sorted(set(COLL.findall(lowered.compile().as_text())))
    assert not hits, (
        f"sharded DA cycle contains collectives {hits}: the cell-major "
        "fold should keep forecast AND analysis device-local")


def test_calibrate_sharded_matches_unsharded(layer_grid):
    """Per-cell adjoint calibration under the mesh equals the
    single-device fit (VERDICT r4 item 1, calibrate leg)."""
    from hybrid9_tpu.calibrate import CalibrationSpec, calibrate

    n, ndays, nisurf = 8 * 16, 5, 4
    params, state0, geom, forcing, obs = _da_setup(layer_grid, n,
                                                   ndays, nisurf)
    spec = CalibrationSpec(fields=("hksat",), per_cell=True)
    kw = dict(spec=spec, nisurf=nisurf, steps=4, learning_rate=0.2)
    c0 = calibrate(params, state0, forcing, geom, obs, **kw)
    cs = CellSharding.create()
    c1 = calibrate(params, state0, forcing, geom, obs, **kw,
                   sharding=cs)
    assert c1.theta["hksat"].sharding.spec == \
        jax.sharding.PartitionSpec("cells")
    np.testing.assert_allclose(np.asarray(c1.theta["hksat"]),
                               np.asarray(c0.theta["hksat"]),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c1.loss_history),
                               np.asarray(c0.loss_history),
                               rtol=2e-4, atol=1e-6)


def test_ensemble_sharded_matches_unsharded(layer_grid):
    """The folded annual ensemble under the mesh equals the
    single-device run (cell-major fold, like assimilate)."""
    from hybrid9_tpu.ensemble import (perturbed_multipliers,
                                      run_ensemble_annual)

    n, ndays, nisurf = 8 * 16, 5, 4
    params, state0, geom, forcing, _ = _da_setup(layer_grid, n, ndays,
                                                 nisurf)
    theta = perturbed_multipliers(jax.random.PRNGKey(0), 4,
                                  fields=("hksat",), sigma=0.3)
    theta = {k: v.astype(jnp.float32) for k, v in theta.items()}
    r0 = run_ensemble_annual(theta, params, state0, forcing, geom,
                             nisurf=nisurf)
    cs = CellSharding.create()
    r1 = run_ensemble_annual(theta, params, state0, forcing, geom,
                             nisurf=nisurf, sharding=cs)
    for k in ("evap", "runoff", "npp"):
        np.testing.assert_allclose(np.asarray(r1[k]), np.asarray(r0[k]),
                                   rtol=2e-4, atol=2e-4)
