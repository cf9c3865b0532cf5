"""Pre-populate the persistent XLA/Mosaic compilation cache.

Cold Mosaic compilation of the VMEM-resident Pallas day kernel takes
minutes (STATUS.md); the persistent cache makes every later run load it
in ~1 s.  Run this once per machine / per code change to take the hit at
a convenient time instead of inside a production run:

    python scripts/warm_cache.py            # flagship 0.5-degree config
    python scripts/warm_cache.py --quarter  # also the 0.25-degree size

Compiles (a) the Pallas day kernel at the flagship block size, (b) the
XLA-path day step, and (c) the full block_step used by the Simulation
driver — with snow, frozen-soil impedance, and routing enabled, matching
Simulation's defaults.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quarter", action="store_true",
                    help="also warm the 0.25-degree cell count")
    ap.add_argument("--cells", type=int, default=66560)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _build
    from hybrid9_tpu.physics.snow import SnowParams
    from hybrid9_tpu.step import day_step

    sizes = [args.cells] + ([283648] if args.quarter else [])
    for n in sizes:
        step_fn, state, forcing, params, geom, cfg = _build(n)
        for use_pallas, tag in ((True, "pallas"), (False, "xla")):
            t0 = time.perf_counter()
            st, diags = jax.jit(
                lambda s, f: day_step(s, f, params, geom, cfg.dt,
                                      cfg.nisurf, use_pallas=use_pallas,
                                      pallas_block=cfg.pallas_block,
                                      snow=SnowParams(), freeze=True,
                                      soil_ice=True)
            )(state, forcing)
            float(jnp.sum(st.soil.h2osoi_liq))   # drain the queue
            print(f"{n} cells, {tag} day step: "
                  f"{time.perf_counter() - t0:.1f}s "
                  f"(cached for future runs)")


if __name__ == "__main__":
    main()
