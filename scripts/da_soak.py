"""Season-length global DA soak on the real chip (VERDICT r4 item 6).

Runs the sequential EnSRF (assimilate.py) at production scale — global
grid, 16 members folded into the cell axis, Pallas forecast — for N
daily cycles of a twin-experiment observation record, then audits
ensemble health:

  - posterior spread in observed cells tightened but bounded away from
    collapse (RTPS floor) and never above the prior sample spread;
  - cells NEVER observed keep a bit-static multiplier ensemble (the
    round-3 unbounded-spread failure mode);
  - innovation magnitude stationary-or-shrinking (late vs early);
  - all posterior fields finite.

The small-grid version of this audit runs in the suite
(tests/test_assimilate.py::test_season_length_da_soak_ensemble_health);
this script is the production-scale leg, and doubles as the fits-on-one-
chip demonstration for 0.25 degrees (--resolution 0.25 --days 2: a
16-member ensemble at 283k cells = 4.5M folded cells through the
production kernel).

Usage: python scripts/da_soak.py [--days 90] [--members 16]
                                 [--resolution 0.5]
Exit 0 iff every health check passes.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=90)
    ap.add_argument("--members", type=int, default=16)
    ap.add_argument("--resolution", type=float, default=0.5)
    ap.add_argument("--spread", type=float, default=0.3)
    ap.add_argument("--obs-err", type=float, default=0.1)
    ap.add_argument("--rtps", type=float, default=0.6)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--truth", type=float, default=0.5)
    args = ap.parse_args()

    import jax.numpy as jnp

    from hybrid9_tpu.assimilate import EnKFConfig, assimilate
    from hybrid9_tpu.calibrate import simulate_daily_et
    from hybrid9_tpu.config import Config
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.data.soil import load_soil
    from hybrid9_tpu.physics.hydrology import Geometry
    from hybrid9_tpu.state import initial_state

    cfg = Config(resolution_deg=args.resolution)
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    nl = lg.nsoil
    dtype = jnp.dtype(cfg.dtype)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    state0 = initial_state(params, lg.dz, lg.zi, dtype)
    geom = Geometry(zi=tuple(map(float, lg.zi)),
                    dz_soil=tuple(map(float, lg.dz[:nl])),
                    zc_soil=tuple(map(float, lg.zc[:nl])))
    n = grid.n_padded
    m = args.members
    ndays = args.days
    provider = SyntheticForcingProvider(n, seed=0, lat=grid.cell_lat)
    forcing = provider(cfg.start_year, 1, ndays)
    forcing = jax.tree_util.tree_map(lambda x: x.astype(dtype), forcing)

    print(f"da_soak: {m} members x {n} cells ({grid.n_land} land) "
          f"x {ndays} days = {m * n} folded cells "
          f"on {jax.devices()[0].device_kind}", flush=True)

    t0 = time.perf_counter()
    obs = simulate_daily_et({"hksat": jnp.full((), args.truth, dtype)},
                            params, state0, forcing, geom, cfg.nisurf,
                            vegetation=cfg.vegetation)
    obs.block_until_ready()
    print(f"twin record generated in {time.perf_counter()-t0:.1f}s "
          f"(truth log-mult {args.truth})", flush=True)

    # Half the land cells are NEVER observed; padding lanes never.
    mask = np.zeros((ndays, n), bool)
    observed = np.arange(grid.n_land) % 2 == 0
    mask[:, :grid.n_land] = observed[None, :]

    use_pallas = (jax.default_backend() == "tpu"
                  and (m * n) % cfg.pallas_block == 0)
    t0 = time.perf_counter()
    res = assimilate(params, state0, forcing, obs, geom, n_members=m,
                     nisurf=cfg.nisurf, obs_mask=jnp.asarray(mask),
                     theta_spread=args.spread, seed=args.seed,
                     vegetation=cfg.vegetation, use_pallas=use_pallas,
                     pallas_block=cfg.pallas_block,
                     zd09_every=cfg.zd09_every,
                     cfg=EnKFConfig(obs_err_std=args.obs_err,
                                    rtps=args.rtps))
    ts = np.asarray(res["theta_std"])[:grid.n_land]   # D2H closes timing
    tm = np.asarray(res["theta_mean"])[:grid.n_land]
    elapsed = time.perf_counter() - t0
    rate = m * n * ndays / elapsed
    print(f"{ndays} DA cycles in {elapsed:.1f}s incl. compile "
          f"({rate/1e6:.1f} M member-cell-days/s, pallas={use_pallas})",
          flush=True)

    theta0 = args.spread * jax.random.normal(
        jax.random.PRNGKey(args.seed), (m, n), dtype)
    std0 = np.asarray(jnp.std(theta0, axis=0))[:grid.n_land]

    failures = []

    def check(name, ok, detail=""):
        print(f"  [{'ok' if ok else 'FAIL'}] {name} {detail}")
        if not ok:
            failures.append(name)

    check("posterior finite", bool(np.all(np.isfinite(ts))
                                   and np.all(np.isfinite(tm))))
    static = np.array_equal(ts[~observed], std0[~observed])
    check("unobserved cells bit-static", static,
          f"({int((~observed).sum())} cells, {ndays} cycles)")
    tso, std0o = ts[observed], std0[observed]
    check("no spread growth", bool(np.all(tso <= std0o + 1e-6)),
          f"(max post/prior = {float(np.max(tso/std0o)):.3f})")
    check("no collapse", np.median(tso) > 0.02,
          f"(median posterior spread {np.median(tso):.3f})")
    if ndays >= 10:
        # Convergence checks need a season, not a smoke run: a 2-cycle
        # fits-on-one-chip demo (--resolution 0.25 --days 2) cannot
        # tighten spread or recover the truth yet.
        check("spread tightened",
              np.median(tso) < 0.9 * np.median(std0o),
              f"(median {np.median(std0o):.3f} -> {np.median(tso):.3f})")
        err = np.abs(np.asarray(res["y_pred_mean"]) - np.asarray(obs))
        err = err[:, :grid.n_land][:, observed]
        third = max(1, ndays // 3)
        early = float(np.mean(err[:third]))
        late = float(np.mean(err[-third:]))
        check("innovations stationary", late <= early * 1.05,
              f"({early:.4g} -> {late:.4g} mm/day)")
        check("posterior toward truth",
              float(np.mean(tm[observed])) > 0.25 * args.truth,
              f"(mean obs-cell log-mult "
              f"{float(np.mean(tm[observed])):.3f}, truth {args.truth})")
    else:
        print(f"  (short run: {ndays} cycles — convergence checks "
              "skipped; this is the fits-on-one-chip demo)")

    print("da_soak:", "ALL PASS" if not failures else
          f"FAILED: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
