"""Roofline probe for the Pallas day kernel (PERFORMANCE.md analysis).

Measures the production bench configuration against counterfactual
variants with transcendentals removed (physically WRONG, measurement
only) to establish how much of the substep is bound by pow/exp on the
VPU vs. everything else (VMEM traffic, fused elementwise arithmetic,
scan overhead).  This quantifies the remaining headroom of further
transcendental-elimination work (STATUS.md "Known gaps").

Usage:  python scripts/perf_probe.py [variant ...]
Variants: base, nopow (conductivity/potential pow -> cheap algebra),
noexp (fsat/rsub/rss exp -> linear), notrans (both).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_CELLS = int(os.environ.get("H9_BENCH_N", "66560"))
N_ITERS = int(os.environ.get("H9_PROBE_ITERS", "60"))


def patch_nopow():
    """Replace the 16 per-substep Clapp-Hornberger pows with cheap
    algebra of matching magnitude (s^2-ish).  WRONG physics."""
    from hybrid9_tpu.physics import soilwater as sw

    def fake(theta, theta_s, hksat, psi_s, bsw, imp=None):
        nl = len(theta)
        hk, dhkdw, smp, dsmpdw = [], [], [], []
        for i in range(nl):
            inext = min(nl - 1, i + 1)
            s1 = 0.5 * (theta[i] + theta[inext]) \
                / (0.5 * (theta_s[i] + theta_s[inext]))
            s1 = jnp.minimum(1.0, s1)
            s2 = hksat[i] * (s1 * s1) * (s1 * s1)     # pow -> mults
            if imp is not None:
                s2 = s2 * jnp.minimum(imp[i], imp[inext])
            hk.append(s1 * s2)
            dhkdw.append((2.0 * bsw[i] + 3.0) * s2
                         * (1.0 / (theta_s[i] + theta_s[inext])))
            s_node = jnp.clip(theta[i] / theta_s[i], 0.01, 1.0)
            smp_i = jnp.maximum(-1.0e8,
                                psi_s[i] / (s_node * s_node))
            smp.append(smp_i)
            dsmpdw.append(-bsw[i] * smp_i / (s_node * theta_s[i]))
        return hk, dhkdw, smp, dsmpdw

    sw._conductivity_and_potential = fake


def patch_noexp():
    """Replace per-substep exps (fsat, rsub_top, rss, aquifer pows)
    with linear stand-ins.  WRONG physics."""
    import hybrid9_tpu.physics.drainage as dr
    import hybrid9_tpu.physics.et as et
    import hybrid9_tpu.physics.hydrology as hy

    real_exp = jnp.exp

    # fsat exp in substep_values / rsub exp in drainage: monkeypatch the
    # module-level jnp reference used inside those modules.
    class FakeJnp:
        def __getattr__(self, k):
            if k == "exp":
                return lambda x: 1.0 + 0.5 * x + 0.125 * x * x
            return getattr(jnp, k)

    hy.jnp = FakeJnp()
    dr.jnp = FakeJnp()
    et.jnp = FakeJnp()
    return real_exp


def run(tag: str):
    from __graft_entry__ import _build
    from hybrid9_tpu.step import day_step
    step_fn, state, forcing, params, geom, cfg = _build(N_CELLS)
    step = jax.jit(
        lambda s, f: day_step(s, f, params, geom, cfg.dt, cfg.nisurf,
                              use_pallas=True, pallas_block=1024,
                              zd09_every=cfg.zd09_every))

    def sync(st):
        return float(jnp.sum(st.soil.h2osoi_liq))

    for _ in range(3):
        state, diags = step(state, forcing)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        state, diags = step(state, forcing)
    sync(state)
    elapsed = time.perf_counter() - t0
    rate = N_CELLS * N_ITERS / elapsed
    print(f"{tag}: {elapsed / N_ITERS * 1e3:.3f} ms/day  "
          f"{rate / 1e6:.2f} M cell-days/s", flush=True)
    return rate


def main():
    variants = sys.argv[1:] or ["base", "nopow", "notrans"]
    for v in variants:
        # Fresh interpreter state per variant matters: run one variant
        # per process when comparing (the patches are global).
        if v == "nopow":
            patch_nopow()
        elif v == "noexp":
            patch_noexp()
        elif v == "notrans":
            patch_nopow()
            patch_noexp()
        run(v)
        break   # one variant per process; loop kept for readability


if __name__ == "__main__":
    main()
