"""Water-balance conservation as a first-class property.

The reference enforces |w1 - w0| <= 0.1 mm per substep with a hard STOP
(HYDROLOGY.f90:1244-1274); here it is a tested invariant of the vectorized
kernel over long trajectories and diverse regimes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.data.synthetic import synthetic_forcing_day
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.grow import grow_daily
from hybrid9_tpu.physics.hydrology import (Geometry, derive_forcing,
                                           hydrology_substep)
from hybrid9_tpu.state import Forcing

from test_hydrology_parity import forcing_from_np, make_ensemble

NL = c.NSOIL_LAYERS


def test_substep_conserves_water(layer_grid, geometry_np):
    """max |residual| < 0.1 mm over 60 days of diverse forcing (f64)."""
    n = 128
    nisurf = 48
    zi, dz, zc = geometry_np
    _, _, params, soil, veg = make_ensemble(n, 11, layer_grid)
    geom = Geometry(zi=tuple(map(float, zi)),
                    dz_soil=tuple(map(float, dz[:NL])),
                    zc_soil=tuple(map(float, zc[:NL])))
    dt = c.SDAY / nisurf

    @jax.jit
    def day_step(soil, veg, f):
        fd = derive_forcing(f)

        def body(s, _):
            s2, fx = hydrology_substep(s, veg, params, fd, geom, dt)
            return s2, jnp.abs(fx.residual)

        soil, res = jax.lax.scan(body, soil, None, length=nisurf)
        veg, _, _ = grow_daily(veg, soil.smp, f.tas, geom.zi)
        return soil, veg, jnp.max(res)

    worst = 0.0
    for d in range(60):
        f = forcing_from_np(synthetic_forcing_day(n, 1 + d, 11))
        soil, veg, maxres = day_step(soil, veg, f)
        worst = max(worst, float(maxres))

    assert worst < 0.1, f"water-balance residual {worst} mm exceeds 0.1 mm"
    # In float64 the residual should be far tighter than the reference's
    # f32 tolerance.
    assert worst < 1e-6, f"f64 residual unexpectedly large: {worst} mm"

    # State sanity after two months.
    h = np.asarray(soil.h2osoi_liq)
    assert np.all(np.isfinite(h))
    assert np.all(h >= 0.0)
    zwt = np.asarray(soil.zwt)
    assert np.all((zwt >= 0.0) & (zwt <= 80.0))


def test_substep_conserves_water_f32(layer_grid, geometry_np):
    """The production f32 path stays within the reference's 0.1 mm."""
    n = 128
    nisurf = 48
    zi, dz, zc = geometry_np
    _, _, params64, soil64, veg64 = make_ensemble(n, 23, layer_grid)
    f32 = jnp.float32
    params = jax.tree_util.tree_map(lambda x: x.astype(f32), params64)
    soil = jax.tree_util.tree_map(lambda x: x.astype(f32), soil64)
    veg = jax.tree_util.tree_map(lambda x: x.astype(f32), veg64)
    geom = Geometry(zi=tuple(map(float, zi)),
                    dz_soil=tuple(map(float, dz[:NL])),
                    zc_soil=tuple(map(float, zc[:NL])))
    dt = c.SDAY / nisurf

    @jax.jit
    def day_step(soil, veg, f):
        fd = derive_forcing(f)

        def body(s, _):
            s2, fx = hydrology_substep(s, veg, params, fd, geom, dt)
            return s2, jnp.abs(fx.residual)

        soil, res = jax.lax.scan(body, soil, None, length=nisurf)
        veg, _, _ = grow_daily(veg, soil.smp, f.tas, geom.zi)
        return soil, veg, jnp.max(res)

    worst = 0.0
    for d in range(30):
        day = synthetic_forcing_day(n, 1 + d, 23)
        f = Forcing(**{k: jnp.asarray(v, f32) for k, v in day.items()})
        soil, veg, maxres = day_step(soil, veg, f)
        worst = max(worst, float(maxres))

    assert worst < 0.1, f"f32 residual {worst} mm exceeds reference bound"
    assert np.all(np.isfinite(np.asarray(soil.h2osoi_liq)))
