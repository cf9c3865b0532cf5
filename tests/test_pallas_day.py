"""Pallas day kernel vs the XLA scan path (interpreter mode on CPU).

The Pallas kernel runs the same value-level physics
(hydrology.substep_values) with a VMEM-resident carry; results must match
the scan path to f32 fusion-reordering tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.physics.pallas_day import pallas_hydrology_day
from hybrid9_tpu.step import day_step


def _build_small(n):
    import __graft_entry__ as ge
    return ge._build(n)


def test_pallas_day_matches_scan_day():
    n = 512
    step_fn, state, forcing, params, geom, cfg = _build_small(n)

    ref_state, ref_diags = jax.jit(
        lambda s, f: day_step(s, f, params, geom, cfg.dt, cfg.nisurf)
    )(state, forcing)

    psoil, pdiags = pallas_hydrology_day(
        state.soil, state.veg, params, forcing, geom, cfg.dt, cfg.nisurf,
        block=256, interpret=True)

    np.testing.assert_allclose(np.asarray(psoil.h2osoi_liq),
                               np.asarray(ref_state.soil.h2osoi_liq),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(psoil.zwt),
                               np.asarray(ref_state.soil.zwt),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(psoil.wa),
                               np.asarray(ref_state.soil.wa),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pdiags["evap_day"]),
                               np.asarray(ref_diags["evap_day"]),
                               rtol=5e-3, atol=1e-3)
    assert float(jnp.max(pdiags["max_abs_residual"])) < 0.1


def test_pallas_day_via_day_step_flag():
    n = 256
    step_fn, state, forcing, params, geom, cfg = _build_small(n)
    # interpret path is selected inside pallas_hydrology_day; on CPU we
    # exercise the flag wiring through day_step with interpret via env.
    from hybrid9_tpu.physics import pallas_day as pd

    orig = pd.pallas_hydrology_day

    def interp(soil, veg, params_, forcing_, geom_, dt, nisurf,
               block=1024, interpret=False, imp=None, **kw):
        return orig(soil, veg, params_, forcing_, geom_, dt, nisurf,
                    block=min(block, 256), interpret=True, imp=imp, **kw)

    pd.pallas_hydrology_day = interp
    try:
        out_state, diags = day_step(state, forcing, params, geom,
                                    cfg.dt, cfg.nisurf, use_pallas=True)
    finally:
        pd.pallas_hydrology_day = orig
    assert np.all(np.isfinite(np.asarray(out_state.soil.h2osoi_liq)))
    assert float(jnp.max(diags["max_abs_residual"])) < 0.1
    # GROW ran after the kernel.
    assert not np.allclose(np.asarray(out_state.veg.lai),
                           np.asarray(state.veg.lai))


def test_pallas_day_sharded_8dev():
    """shard_map'd Pallas day kernel over the 8-device mesh (interpret)."""
    import jax
    from jax.sharding import Mesh
    import numpy as np
    from hybrid9_tpu.physics.pallas_day import (
        pallas_hydrology_day_sharded)

    n = 8 * 256
    step_fn, state, forcing, params, geom, cfg = _build_small(n)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("cells",))
    soil_sh, diags_sh = pallas_hydrology_day_sharded(
        state.soil, state.veg, params, forcing, geom, cfg.dt, cfg.nisurf,
        mesh=mesh, block=256, interpret=True)

    ref_state, ref_diags = jax.jit(
        lambda s, f: day_step(s, f, params, geom, cfg.dt, cfg.nisurf)
    )(state, forcing)
    np.testing.assert_allclose(np.asarray(soil_sh.h2osoi_liq),
                               np.asarray(ref_state.soil.h2osoi_liq),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(diags_sh["evap_day"]),
                               np.asarray(ref_diags["evap_day"]),
                               rtol=5e-3, atol=1e-3)


def test_pallas_path_keeps_focus_wt_trace():
    """VERDICT r3 item 5: the Pallas production branch must emit the
    per-substep focus-cell water-table trace (the reference's unit-98
    INTERACTIVE artifact, HYDROLOGY.f90:509) via the one-cell XLA
    shadow scan, matching the XLA path's trace."""
    n = 256
    step_fn, state, forcing, params, geom, cfg = _build_small(n)
    focus = 37

    _, xla_diags = day_step(state, forcing, params, geom, cfg.dt,
                            cfg.nisurf, focus_idx=focus)
    assert xla_diags["wt_substeps"].shape == (cfg.nisurf,)

    from hybrid9_tpu.physics import pallas_day as pd
    orig = pd.pallas_hydrology_day

    def interp(soil, veg, params_, forcing_, geom_, dt, nisurf,
               block=1024, interpret=False, imp=None, **kw):
        return orig(soil, veg, params_, forcing_, geom_, dt, nisurf,
                    block=min(block, 256), interpret=True, imp=imp, **kw)

    pd.pallas_hydrology_day = interp
    try:
        _, pal_diags = day_step(state, forcing, params, geom, cfg.dt,
                                cfg.nisurf, use_pallas=True,
                                focus_idx=focus)
    finally:
        pd.pallas_hydrology_day = orig
    assert pal_diags["wt_substeps"].shape == (cfg.nisurf,)
    # The shadow replays the identical XLA substep math, so the two
    # traces agree to round-off.
    np.testing.assert_allclose(np.asarray(pal_diags["wt_substeps"]),
                               np.asarray(xla_diags["wt_substeps"]),
                               rtol=1e-6, atol=1e-8)
