"""Bisect the zd09_every=8 multi-year NaN blowup (round-4 diagnosis).

Runs the zd09_drift configuration (0.5 deg, reference-scope physics,
k=8, production Pallas path) day by day, keeping the previous day's
state; at the first non-finite day it:

  1. reports the day and the offending cells,
  2. re-steps the SAME pre-blowup state with k=1 (both paths) and with
     k=8 on the XLA path — isolating approximation vs kernel,
  3. dumps the pre-blowup column state of the first offending cell.

Writes the pre-blowup state snapshot to zd09_blowup_state.npz for
offline study.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax                                                 # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp                                    # noqa: E402

from hybrid9_tpu import calendar                           # noqa: E402
from hybrid9_tpu.config import Config                      # noqa: E402
from hybrid9_tpu.data.forcing import SyntheticForcingProvider  # noqa: E402
from hybrid9_tpu.data.soil import load_soil                # noqa: E402
from hybrid9_tpu.physics.hydrology import Geometry         # noqa: E402
from hybrid9_tpu.state import initial_state                # noqa: E402
from hybrid9_tpu.step import day_step                      # noqa: E402


def main() -> int:
    cfg = Config(resolution_deg=0.5, start_year=1901, end_year=1915,
                 nisurf=48, zd09_every=8, snow=False, snow_albedo=False,
                 frozen_soil=False, soil_ice=False, carbon=False,
                 lateral_routing=False, write_annual=False)
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    dtype = jnp.dtype(cfg.dtype)
    state = initial_state(params, lg.dz, lg.zi, dtype)
    geom = Geometry.from_layer_grid(lg, dtype)
    provider = SyntheticForcingProvider(grid.n_padded, seed=0,
                                        lat=grid.cell_lat)
    use_pallas = jax.default_backend() == "tpu"
    print(f"backend {jax.default_backend()}, pallas={use_pallas}, "
          f"{grid.n_land} land cells")

    def make_step(k, pallas):
        return jax.jit(lambda s, f: day_step(
            s, f, params, geom, cfg.dt, cfg.nisurf, use_pallas=pallas,
            pallas_block=cfg.pallas_block, zd09_every=k))

    step8 = make_step(8, use_pallas)

    @jax.jit
    def bad_count(s):
        ok = jnp.isfinite(s.soil.zwt) & jnp.all(
            jnp.isfinite(s.soil.h2osoi_liq), axis=1) \
            & jnp.isfinite(s.soil.wa)
        return jnp.sum(~ok[:grid.n_land])

    prev = state
    prev_f = None
    found = None
    for year in range(cfg.start_year, cfg.end_year + 1):
        ndays = calendar.days_in_year(year)
        block = provider(year, 1, ndays)
        for d in range(ndays):
            f_day = jax.tree_util.tree_map(lambda x: x[d], block)
            new_state, diags = step8(prev, f_day)
            nb = int(bad_count(new_state))
            if nb:
                found = (year, d + 1, nb)
                prev_f = f_day
                break
            prev = new_state
        if found:
            break
        print(f"year {year}: clean "
              f"(mean zwt {float(jnp.mean(new_state.soil.zwt)):.2f} m)")
    if not found:
        print("no blowup found — nothing to bisect")
        return 0
    year, doy, nb = found
    print(f"\nFIRST NON-FINITE: year {year} doy {doy}: {nb} cells")

    ok = np.isfinite(np.asarray(new_state.soil.zwt)) \
        & np.all(np.isfinite(np.asarray(new_state.soil.h2osoi_liq)),
                 axis=1) \
        & np.isfinite(np.asarray(new_state.soil.wa))
    bad_idx = np.flatnonzero(~ok[:grid.n_land])
    print(f"offending cells: {bad_idx[:12]}")
    for j in bad_idx[:4]:
        print(f"  cell {j}: post-step zwt="
              f"{float(np.asarray(new_state.soil.zwt)[j]):.4f} "
              f"wa={float(np.asarray(new_state.soil.wa)[j]):.4f} "
              f"h2osoi={np.asarray(new_state.soil.h2osoi_liq)[j]}")

    # Full pre-blowup snapshot: lets the single bad day be re-stepped
    # offline (the XLA path reproduces, so CPU debugging works).
    full = {}
    for name, leaf in [("h2osoi", prev.soil.h2osoi_liq),
                       ("zwt", prev.soil.zwt), ("wa", prev.soil.wa),
                       ("smp", prev.soil.smp),
                       ("lai", prev.veg.lai),
                       ("lai_litter", prev.veg.lai_litter),
                       ("plant_mass", prev.veg.plant_mass),
                       ("plant_foliage_mass",
                        prev.veg.plant_foliage_mass),
                       ("rootr", prev.veg.rootr)]:
        full[name] = np.asarray(leaf)
    for f in ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs"):
        full[f"forc_{f}"] = np.asarray(getattr(prev_f, f))
    full["bad_idx"] = bad_idx
    np.savez_compressed("zd09_blowup_full.npz", **full)
    print("wrote zd09_blowup_full.npz (full pre-blowup state)")

    # Isolation matrix: same pre-blowup state, one day, four configs.
    for label, k, pal in (("k=8 pallas", 8, use_pallas),
                          ("k=1 pallas", 1, use_pallas),
                          ("k=8 xla", 8, False),
                          ("k=1 xla", 1, False)):
        st, diags = make_step(k, pal)(prev, prev_f)
        nb2 = int(bad_count(st))
        res = float(jnp.max(diags["max_abs_residual"]))
        print(f"  {label:12s}: bad={nb2:5d} max|res|={res:.3g} mm")

    i = int(bad_idx[0])
    snap = dict(
        h2osoi=np.asarray(prev.soil.h2osoi_liq)[bad_idx],
        zwt=np.asarray(prev.soil.zwt)[bad_idx],
        wa=np.asarray(prev.soil.wa)[bad_idx],
        smp=np.asarray(prev.soil.smp)[bad_idx],
        lai=np.asarray(prev.veg.lai)[bad_idx],
        theta_s=np.asarray(params.theta_s)[bad_idx],
        hksat=np.asarray(params.hksat)[bad_idx],
        bsw=np.asarray(params.bsw)[bad_idx],
        psi_s=np.asarray(params.psi_s)[bad_idx],
        fmax=np.asarray(params.fmax)[bad_idx],
        tas=np.asarray(prev_f.tas)[bad_idx],
        pr=np.asarray(prev_f.pr)[bad_idx],
        bad_idx=bad_idx, year=year, doy=doy,
    )
    np.savez("zd09_blowup_state.npz", **snap)
    print(f"\nfirst bad cell {i}: zwt={snap['zwt'][0]:.3f} m "
          f"wa={snap['wa'][0]:.1f} mm")
    print(f"  h2osoi: {snap['h2osoi'][0]}")
    print(f"  theta_s: {snap['theta_s'][0]}")
    print(f"  bsw: {snap['bsw'][0]}")
    print(f"  psi_s: {snap['psi_s'][0]}")
    print(f"  hksat: {snap['hksat'][0]}")
    print(f"  tas={snap['tas'][0]:.1f} K pr={snap['pr'][0]:.2e} mm/s "
          f"lai={snap['lai'][0]:.3f}")
    print("wrote zd09_blowup_state.npz")
    return 1


if __name__ == "__main__":
    sys.exit(main())
