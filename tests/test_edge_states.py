"""Edge-state fuzzing: parity oracle-vs-vector at pathological states.

The drainage/water-table mask algebra is where parity is won or lost
(SURVEY.md §7 "hard parts").  These tests place columns exactly at the
branch boundaries — water tables on layer interfaces, layers at the
watmin floor, saturated columns, zero/extreme forcing — and require the
vectorized kernel to match the float64 oracle through a full day.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.data.synthetic import synthetic_soil_params
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics import reference_column as ref
from hybrid9_tpu.physics.hydrology import (Geometry, derive_forcing,
                                           hydrology_substep)
from hybrid9_tpu.state import Forcing, SoilParams, SoilState, VegState

NL = c.NSOIL_LAYERS


def _build_edge_ensemble(layer_grid):
    """Columns engineered onto branch boundaries."""
    zi, dz = layer_grid.zi, layer_grid.dz
    p = synthetic_soil_params(64, seed=42)
    n = 64
    rng = np.random.RandomState(42)

    frac = rng.uniform(0.3, 0.9, size=(n, NL))
    h2osoi = frac * p["theta_s"] * dz[None, :NL]
    zwt = np.empty(n)
    for i in range(n):
        k = i % 16
        if k < 9:
            zwt[i] = zi[k + 1] / 1000.0          # exactly on interface k
        elif k == 9:
            zwt[i] = 0.0                          # at the surface
        elif k == 10:
            zwt[i] = 80.0                         # at the deep clamp
        elif k == 11:
            zwt[i] = zi[NL] / 1000.0 + 1e-6       # just below the column
        elif k == 12:
            h2osoi[i] = np.full(NL, c.WATMIN)     # all layers at watmin
            zwt[i] = 1.0
        elif k == 13:
            h2osoi[i] = p["theta_s"][i] * dz[:NL]  # fully saturated
            zwt[i] = 0.05
        elif k == 14:
            h2osoi[i, NL - 1] = 0.5 * c.WATMIN    # bottom layer short
            zwt[i] = 3.0
        else:
            h2osoi[i, 0] = 0.5 * c.WATMIN         # top layer short
            zwt[i] = 0.2
    wa = np.where(np.arange(n) % 3 == 0, 5000.0, 3000.0)
    s = np.clip(h2osoi / dz[None, :NL] / p["theta_s"], 0.01, 1.0)
    smp = np.maximum(c.SMPMIN, p["psi_s"] * s ** (-p["bsw"]))
    lai = np.where(np.arange(n) % 4 == 0, 0.001, 2.0)
    lai_litter = np.full(n, 0.2)
    rootr = np.full((n, NL), 1.0 / NL)
    return p, h2osoi, zwt, wa, smp, lai, lai_litter, rootr


def test_edge_states_parity(layer_grid, geometry_np):
    zi, dz, zc = geometry_np
    (p, h2osoi, zwt, wa, smp, lai, lai_litter,
     rootr) = _build_edge_ensemble(layer_grid)
    n = h2osoi.shape[0]
    f64 = jnp.float64
    params = SoilParams(**{k: jnp.asarray(v, f64) for k, v in p.items()})
    soil = SoilState(h2osoi_liq=jnp.asarray(h2osoi, f64),
                     zwt=jnp.asarray(zwt, f64), wa=jnp.asarray(wa, f64),
                     smp=jnp.asarray(smp, f64),
                     h2osoi_liq_ma=jnp.zeros((n, NL), f64))
    veg = VegState(plant_mass=jnp.ones((n,), f64),
                   plant_foliage_mass=jnp.full((n,), 0.04, f64),
                   plant_length=jnp.full((n,), 50.0, f64),
                   rdepth=jnp.full((n,), 15.0, f64),
                   lai=jnp.asarray(lai, f64),
                   lai_litter=jnp.asarray(lai_litter, f64),
                   rootr=jnp.asarray(rootr, f64),
                   c_labile=jnp.zeros((n,), f64),
                   n_labile=jnp.zeros((n,), f64),
                   p_labile=jnp.zeros((n,), f64))
    geom = Geometry(zi=tuple(map(float, zi)),
                    dz_soil=tuple(map(float, dz[:NL])),
                    zc_soil=tuple(map(float, zc[:NL])))
    dt = c.SDAY / 48.0

    # Three forcing regimes: deluge, dry heat, frozen calm.
    regimes = [
        dict(tas=288.0, rlds=350.0, rsds=180.0, huss=8e-3, ps=101325.0,
             pr=5.0e-4, rhs=95.0),
        dict(tas=313.0, rlds=380.0, rsds=400.0, huss=4e-3, ps=98000.0,
             pr=0.0, rhs=12.0),
        dict(tas=258.0, rlds=180.0, rsds=30.0, huss=8e-4, ps=102000.0,
             pr=0.0, rhs=70.0),
    ]
    for reg in regimes:
        fday = {k: np.full(n, v) for k, v in reg.items()}
        f = Forcing(**{k: jnp.asarray(v, f64) for k, v in fday.items()})
        fd = derive_forcing(f)
        soil_v = soil
        oracle_states = [
            ref.ColumnState(h2osoi=h2osoi[i].copy(), zwt=float(zwt[i]),
                            wa=float(wa[i]), smp=smp[i].copy(),
                            lai=float(lai[i]),
                            lai_litter=float(lai_litter[i]),
                            rootr=rootr[i].copy(), plant_mass=1.0,
                            plant_foliage_mass=0.04)
            for i in range(n)]
        oracle_params = [
            ref.ColumnParams(theta_s=p["theta_s"][i],
                             hksat=p["hksat"][i], bsw=p["bsw"][i],
                             psi_s=p["psi_s"][i],
                             fmax=float(p["fmax"][i]))
            for i in range(n)]
        sub = jax.jit(lambda s: hydrology_substep(s, veg, params, fd,
                                                  geom, dt))
        fdd = ref.derived_forcing(ref.DailyForcing(**reg))
        for ns in range(48):
            soil_v, fx = sub(soil_v)
            for i in range(n):
                ref.hydrology_substep(oracle_states[i], oracle_params[i],
                                      fdd, zi, dz.copy(), zc.copy(), dt)
        for i in range(n):
            np.testing.assert_allclose(
                np.asarray(soil_v.h2osoi_liq[i]),
                oracle_states[i].h2osoi, rtol=1e-7, atol=1e-7,
                err_msg=f"h2osoi col {i} regime {reg['tas']}")
            np.testing.assert_allclose(
                float(soil_v.zwt[i]), oracle_states[i].zwt, rtol=1e-7,
                atol=1e-9, err_msg=f"zwt col {i} regime {reg['tas']}")
            np.testing.assert_allclose(
                float(soil_v.wa[i]), oracle_states[i].wa, rtol=1e-7,
                atol=1e-7, err_msg=f"wa col {i} regime {reg['tas']}")
        # And the invariant holds at every edge state.
        assert float(jnp.max(jnp.abs(fx.residual))) < 1e-6
