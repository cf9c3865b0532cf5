"""Per-substep probe of the zd09_every blowup cell (offline, CPU).

Loads the pre-blowup snapshot written by zd09_debug.py, rebuilds the
single offending column, and replays the fatal day substep-by-substep
under the k=8 refresh cadence, printing the water table, aquifer store,
recharge and baseflow each substep — the mechanism trace.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax                                                 # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                    # noqa: E402

from hybrid9_tpu.config import Config                      # noqa: E402
from hybrid9_tpu.data.soil import load_soil                # noqa: E402
from hybrid9_tpu.physics.drainage import (                 # noqa: E402
    compute_specific_yields)
from hybrid9_tpu.physics.et import daily_et_context        # noqa: E402
from hybrid9_tpu.physics.hydrology import (                # noqa: E402
    Geometry, derive_forcing, hydrology_substep)
from hybrid9_tpu.physics.layers import stack, unstack      # noqa: E402
from hybrid9_tpu.physics.soilwater import (                # noqa: E402
    compute_equilibrium_zq, water_table_index)
from hybrid9_tpu.state import Forcing, initial_state       # noqa: E402

CELL = 1291
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main() -> int:
    z = np.load("zd09_blowup_full.npz")
    cfg = Config(resolution_deg=0.5, nisurf=48)
    grid, params = load_soil(cfg)
    lg = cfg.layer_grid()
    dtype = jnp.float32
    geom = Geometry.from_layer_grid(lg, dtype)
    dt = cfg.dt

    sel = slice(CELL, CELL + 1)
    state = initial_state(params, lg.dz, lg.zi, dtype)
    soil = state.soil.replace(
        h2osoi_liq=jnp.asarray(z["h2osoi"][sel], dtype),
        zwt=jnp.asarray(z["zwt"][sel], dtype),
        wa=jnp.asarray(z["wa"][sel], dtype),
        smp=jnp.asarray(z["smp"][sel], dtype))
    veg = state.veg.replace(
        lai=jnp.asarray(z["lai"][sel], dtype),
        lai_litter=jnp.asarray(z["lai_litter"][sel], dtype),
        rootr=jnp.asarray(z["rootr"][sel], dtype))
    p1 = jax.tree_util.tree_map(lambda x: x[sel], params)
    f1 = Forcing(**{k: jnp.asarray(z[f"forc_{k}"][sel], dtype)
                    for k in ("tas", "rlds", "rsds", "huss", "ps",
                              "pr", "rhs")})
    fd = derive_forcing(f1, None)
    et_ctx = daily_et_context(fd, veg.lai)
    zi = jnp.asarray(lg.zi, dtype)

    def fresh(zwt):
        zq = stack(compute_equilibrium_zq(
            zwt, unstack(p1.theta_s), unstack(p1.psi_s),
            unstack(p1.bsw), geom.zi))
        sy = stack(compute_specific_yields(
            zwt, unstack(p1.theta_s), unstack(p1.psi_s),
            unstack(p1.bsw)))
        return zq, sy

    zq = sy = None
    print(f"k={K}; start zwt={float(soil.zwt[0]):.4f} m "
          f"wa={float(soil.wa[0]):.2f} mm  "
          f"rain={float(fd['forc_rain'][0])*86400:.2f} mm/day")
    for it in range(cfg.nisurf):
        if K > 1:
            if it % K == 0:
                zq, sy = fresh(soil.zwt)
                tag = "R"            # refreshed this substep
            else:
                tag = " "
            soil, fx = hydrology_substep(soil, veg, p1, fd, geom, dt,
                                         zq=zq, sy=sy, et_ctx=et_ctx)
        else:
            tag = "R"
            soil, fx = hydrology_substep(soil, veg, p1, fd, geom, dt,
                                         et_ctx=et_ctx)
        jwt = int(water_table_index(soil.zwt, zi)[0])
        print(f"  {it:2d}{tag} zwt={float(soil.zwt[0]):12.5f} jwt={jwt} "
              f"wa={float(soil.wa[0]):14.3f} "
              f"qcharge={float(fx.qcharge[0]):12.4e} mm/s "
              f"rsub={float(fx.rsub_top[0]):12.4e} "
              f"res={float(fx.residual[0]):10.3e}")
        if not np.isfinite(float(soil.wa[0])):
            print("  -> NON-FINITE, stopping")
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
