"""Real-TPU smoke lane (VERDICT r4 item 3).

Every axon-backend quirk so far (D2H queue drain, donation rejection,
one-process limit, 10-minute cold XLA compiles) was discovered by
surprise during perf work because the 182-test suite runs on the CPU
backend (tests/conftest.py).  This lane runs the handful of checks that
must hold ON THE ACTUAL CHIP, in under ~5 minutes warm, so backend
regressions are caught by a test instead of by archaeology — the
reference project's own verification culture was exactly this
run-it-on-the-real-hardware loop (reference notes.txt:36-60).

Checks:
  1. Pallas-vs-XLA day parity at the production block size (1024).
  2. Checksum-closed throughput sanity: a timed multi-day loop ends
     with a device-to-host read (block_until_ready does NOT drain the
     axon dispatch queue) and must beat a floor far below production
     speed but far above any accidentally-interpreted/fallback path.
  3. Checkpoint save/restore round-trip, bitwise.
  4. One focus-trace day on the Pallas path (the unit-98 shadow scan).
  5. One day through the shard_map'd kernel under a 1-device mesh
     (the --shard dispatch path on real hardware).
  6. One 3-day sharded EnSRF DA cycle (folded ensemble on-chip).

Usage: python scripts/tpu_smoke.py   (exit 0 = all pass; exit 2 = no
TPU backend present, the lane does not apply)
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()!r}, not tpu")
        return 2

    import jax.numpy as jnp

    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.synthetic import synthetic_forcing_day
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.parallel.sharding import CellSharding
    from hybrid9_tpu.physics.hydrology import Geometry
    from hybrid9_tpu.state import Forcing, initial_state
    from hybrid9_tpu.step import day_step

    t_start = time.perf_counter()
    failures = []

    def check(name, ok, detail=""):
        status = "ok" if ok else "FAIL"
        print(f"  [{status}] {name} {detail}")
        if not ok:
            failures.append(name)

    cfg = Config(resolution_deg=2.0)          # ~4.3k land cells
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    dtype = jnp.dtype(cfg.dtype)
    state0 = initial_state(params, lg.dz, lg.zi, dtype)
    geom = Geometry.from_layer_grid(lg, dtype)
    n = grid.n_padded
    day = synthetic_forcing_day(n, 180, seed=7, lat=grid.cell_lat)
    forcing = Forcing(**{k: jnp.asarray(v, dtype)
                         for k, v in day.items()})
    dt = cfg.dt
    print(f"tpu_smoke: {n} cells ({grid.n_land} land) on "
          f"{jax.devices()[0].device_kind}")

    # -- 1. Pallas vs XLA day parity at production block size --------
    step_xla = jax.jit(lambda s, f: day_step(
        s, f, params, geom, dt, cfg.nisurf))
    step_pal = jax.jit(lambda s, f: day_step(
        s, f, params, geom, dt, cfg.nisurf, use_pallas=True,
        pallas_block=cfg.pallas_block))
    sx, dx = step_xla(state0, forcing)
    sp, dp = step_pal(state0, forcing)
    d_theta = float(jnp.max(jnp.abs(sp.soil.h2osoi_liq
                                    - sx.soil.h2osoi_liq)))
    d_zwt = float(jnp.max(jnp.abs(sp.soil.zwt - sx.soil.zwt)))
    d_evap = float(jnp.max(jnp.abs(dp["evap_day"] - dx["evap_day"])))
    check("pallas-vs-xla day parity",
          d_theta < 0.5 and d_zwt < 5.0e-3 and d_evap < 5.0e-3,
          f"(d_h2o={d_theta:.2e} mm, d_zwt={d_zwt:.2e} m, "
          f"d_evap={d_evap:.2e} mm)")
    res = float(jnp.max(dp["max_abs_residual"]))
    check("pallas day residual", res < 0.1, f"(max|res|={res:.3g} mm)")

    # -- 2. Checksum-closed throughput sanity ------------------------
    ndays_t = 20
    state = sp
    t0 = time.perf_counter()
    for _ in range(ndays_t):
        state, diags = step_pal(state, forcing)
    # Close the timed region with a D2H read: on axon,
    # block_until_ready returns with work still queued, so a checksum
    # fetch is the only honest timer fence (PERFORMANCE.md rule).
    checksum = float(jnp.sum(diags["evap_day"]))
    elapsed = time.perf_counter() - t0
    rate = n * ndays_t / elapsed
    check("checksum finite", np.isfinite(checksum),
          f"(sum evap_day = {checksum:.4g})")
    # Floor: production is ~15-19 M cell-days/s at 69k cells, but at
    # 5k cells each day step is DISPATCH-bound over the axon tunnel
    # (~19 ms/day observed -> ~0.27 M).  The check exists to catch an
    # accidentally-interpreted Pallas kernel or a CPU fallback, which
    # are ~1000x slower still — floor well below dispatch-bound speed,
    # well above any fallback.
    check("throughput sane", rate > 5.0e4,
          f"({rate/1e6:.2f} M cell-days/s, small-batch "
          "dispatch-bound)")

    # -- 3. Checkpoint save/restore round-trip -----------------------
    from hybrid9_tpu.io.checkpoint import Checkpointer
    with tempfile.TemporaryDirectory() as td:
        ck = Checkpointer(td)
        ck.save(1901, state)
        ck.wait()
        year, restored = ck.restore(
            jax.tree_util.tree_map(jnp.zeros_like, state))
        ck.close()
        same = year == 1901 and all(
            bool(jnp.array_equal(a, b)) for a, b in zip(
                jax.tree_util.tree_leaves(state),
                jax.tree_util.tree_leaves(restored)))
    check("checkpoint round-trip bitwise", same)

    # -- 4. Focus-trace day on the Pallas path -----------------------
    step_focus = jax.jit(lambda s, f: day_step(
        s, f, params, geom, dt, cfg.nisurf, use_pallas=True,
        pallas_block=cfg.pallas_block, focus_idx=0))
    _, dfoc = step_focus(state0, forcing)
    wt = np.asarray(dfoc["wt_substeps"])
    check("focus substep trace", wt.shape == (cfg.nisurf,)
          and np.all(np.isfinite(wt)),
          f"(nisurf={cfg.nisurf}, wt[0]={wt[0]:.3f} m)")

    # -- 5. One day through the shard_map'd kernel (1-device mesh) ---
    cs = CellSharding.create()
    st_sh = cs.put(state0)
    p_sh = cs.put(params)
    f_sh = cs.put(forcing)
    step_sh = jax.jit(lambda s, f: day_step(
        s, f, p_sh, geom, dt, cfg.nisurf, use_pallas=True,
        pallas_block=cfg.pallas_block, mesh=cs.mesh))
    ssh, dsh = step_sh(st_sh, f_sh)
    d_sh = float(jnp.max(jnp.abs(ssh.soil.h2osoi_liq
                                 - sp.soil.h2osoi_liq)))
    check("shard_map'd kernel day", d_sh < 1.0e-3,
          f"({cs.n_devices}-device mesh, d_h2o={d_sh:.2e} mm)")

    # -- 6. Sharded EnSRF mini-cycle (folded ensemble on-chip) -------
    from hybrid9_tpu.assimilate import assimilate
    from hybrid9_tpu.calibrate import simulate_daily_et
    fields = ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs")
    days3 = [synthetic_forcing_day(n, d + 1, seed=9, lat=grid.cell_lat)
             for d in range(3)]
    f3 = Forcing(**{k: jnp.stack([jnp.asarray(d[k], dtype)
                                  for d in days3]) for k in fields})
    obs = simulate_daily_et({"hksat": jnp.full((), 0.5, dtype)},
                            params, state0, f3, geom, 8)
    r = assimilate(params, state0, f3, obs, geom, n_members=4,
                   nisurf=8, seed=1, sharding=cs, use_pallas=True,
                   pallas_block=cfg.pallas_block)
    tm = np.asarray(r["theta_mean"])[:grid.n_land]
    check("sharded DA cycle", np.all(np.isfinite(tm)),
          f"(3 days, 4 members, mean theta={float(np.mean(tm)):.4f})")

    wall = time.perf_counter() - t_start
    status = "ALL PASS" if not failures else f"FAILED: {failures}"
    print(f"tpu_smoke: {status} in {wall:.0f}s")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
