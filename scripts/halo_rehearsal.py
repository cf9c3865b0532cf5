"""Production-resolution halo-router rehearsal (VERDICT r3 item 7).

Runs the dense halo-exchange grid router (Config.routing_form="grid")
at the REAL production resolution — 0.5 degrees, 360x720 dense grid,
row-sharded over an 8-virtual-device CPU mesh — through the same
compiled-HLO communication audit the 1.5-degree test pins
(tests/test_no_accidental_comms.py::test_grid_routing_halos_are_
collective_permutes), then times one routed day in BOTH routing forms
(packed segment-sum vs dense halo grid) so the form choice is a
measured trade, not a guess.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/halo_rehearsal.py
Prints the audit verdict, the collective census, and the per-day wall
times; exit 0 iff the audit holds.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                     # noqa: E402
import numpy as np                                          # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import __graft_entry__ as ge                                # noqa: E402
from hybrid9_tpu.grids.grid import (make_land_grid,         # noqa: E402
                                    synthetic_land_mask)
from hybrid9_tpu.grids.routing import (build_downstream_index,  # noqa: E402
                                       direction_codes, flow_length_m)
from hybrid9_tpu.parallel.sharding import CellSharding      # noqa: E402
from hybrid9_tpu.physics.routing import (GridKinematicParams,  # noqa: E402
                                         GridRouting,
                                         KinematicParams)
from hybrid9_tpu.step import day_step                       # noqa: E402

_COLLECTIVE_RE = re.compile(
    r"all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter|collective-broadcast")

NISURF = 4          # audit property is nisurf-independent (budget test)
N_SUBSTEPS = 8      # production routing_substeps default


def main() -> int:
    cs = CellSharding.create()
    print(f"mesh: {cs.n_devices} devices")
    mask = synthetic_land_mask(resolution_deg=0.5, seed=1)
    grid = make_land_grid(mask, 0.5, pad_multiple=1024)
    print(f"grid: {grid.ny}x{grid.nx} dense, {grid.n_land} land cells, "
          f"{grid.n_padded} padded")
    assert grid.ny % cs.n_devices == 0, "rows must divide the mesh"
    down = build_downstream_index(grid)
    codes = direction_codes(grid, down)
    length_packed = flow_length_m(grid, down)
    length_g = grid.scatter(length_packed, fill=1.0)
    dense_sh = NamedSharding(cs.mesh, P(cs.axis, None))

    flat_idx = np.full(grid.n_padded, -1, np.int64)
    flat_idx[:grid.n_land] = grid.land_idx
    land_flat = np.zeros(grid.ny * grid.nx, bool)
    land_flat[grid.land_idx] = True
    flat_idx[grid.n_land:] = int(np.flatnonzero(~land_flat)[0])
    routing_grid = GridRouting(
        params=GridKinematicParams(
            dir_code=jax.device_put(jnp.asarray(codes), dense_sh),
            flow_length=jax.device_put(
                jnp.asarray(length_g, jnp.float32), dense_sh),
            n_substeps=N_SUBSTEPS),
        flat_idx=cs.put(jnp.asarray(flat_idx, jnp.int32)),
        n_land=grid.n_land, ny=grid.ny, nx=grid.nx,
        dense_sharding=dense_sh)
    routing_packed = KinematicParams(
        downstream=cs.put(jnp.asarray(down, jnp.int32)),
        flow_length=cs.put(jnp.asarray(length_packed, jnp.float32)),
        n_substeps=N_SUBSTEPS)

    _, state, forcing, params, geom, cfg = ge._build(grid.n_padded)
    state = cs.put(state)
    forcing = cs.put(forcing)
    params = cs.put(params)

    def fn_grid(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt,
                             NISURF, routing=routing_grid)
        return st, diags["discharge"]

    def fn_packed(state, forcing):
        st, diags = day_step(state, forcing, params, geom, cfg.dt,
                             NISURF, routing=routing_packed)
        return st, diags["discharge"]

    # ---- Audit (the 1.5-degree test's property at 360 rows) ----------
    t0 = time.perf_counter()
    text = jax.jit(fn_grid).lower(state, forcing).compile().as_text()
    print(f"grid-form compile: {time.perf_counter() - t0:.1f}s, "
          f"HLO {len(text) / 1e6:.1f} MB")
    census: dict = {}
    for hit in _COLLECTIVE_RE.findall(text):
        census[hit] = census.get(hit, 0) + 1
    print(f"collective census: {census}")
    ok = "collective-permute" in census
    if not ok:
        print("FAIL: grid routing compiled without halo exchanges")
    for comp in text.split("\n\n"):
        lines = comp.splitlines()
        if not lines or lines[0].lstrip().startswith("ENTRY"):
            continue
        hits = sorted(set(re.findall(r"all-gather|all-to-all", comp)))
        if hits:
            ok = False
            print(f"FAIL: gather collectives {hits} inside non-entry "
                  f"computation {lines[0][:80]!r}")
    if ok:
        print("audit OK at 360 rows: halos are collective-permutes; "
              "gathers only in the entry resharding")

    # ---- Timing: one routed day, both forms --------------------------
    results = {}
    for name, fn in (("grid", fn_grid), ("packed", fn_packed)):
        jfn = jax.jit(fn)
        st, dis = jfn(state, forcing)           # warm (compile)
        assert np.all(np.isfinite(np.asarray(dis)))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            st, dis = jfn(state, forcing)
        float(jnp.sum(dis))                     # D2H queue drain
        dtire = (time.perf_counter() - t0) / iters
        results[name] = dtire
        print(f"{name:6s} routed day: {dtire * 1e3:.0f} ms "
              f"(8-virtual-device CPU mesh, {grid.n_land} land cells, "
              f"nisurf={NISURF}, routing substeps={N_SUBSTEPS})")
    print(f"grid/packed wall ratio: "
          f"{results['grid'] / results['packed']:.2f}x")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
