"""Parity: vectorized JAX hydrology/growth vs the float64 column oracle.

The oracle (hybrid9_tpu.physics.reference_column) is a loop-and-branch
transcription of the governing equations; the production kernels are
mask-vectorized.  They must agree on randomized columns spanning both
water-table regimes (in-column and below-column), wet and dry soils, and
across multi-day trajectories including the GROW coupling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid9_tpu.data.synthetic import (synthetic_forcing_day,
                                        synthetic_soil_params)
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics import reference_column as ref
from hybrid9_tpu.physics.grow import grow_daily
from hybrid9_tpu.physics.hydrology import (Geometry, derive_forcing,
                                           hydrology_substep)
from hybrid9_tpu.state import Forcing, SoilParams, SoilState, VegState

NL = c.NSOIL_LAYERS


def make_ensemble(n, seed, layer_grid):
    """Matched (oracle, vector) initial states over diverse regimes."""
    rng = np.random.RandomState(seed)
    p = synthetic_soil_params(n, seed)
    zi, dz = layer_grid.zi, layer_grid.dz

    frac = rng.uniform(0.15, 0.98, size=(n, NL))
    h2osoi = frac * p["theta_s"] * dz[None, :NL]
    # Water tables from near-surface to well below the column.
    zwt = 10.0 ** rng.uniform(np.log10(0.03), np.log10(12.0), size=n)
    wa = rng.uniform(2500.0, 5000.0, size=n)
    s = np.clip(frac, 0.01, 1.0)
    smp = np.maximum(c.SMPMIN, p["psi_s"] * s ** (-p["bsw"]))
    lai = rng.uniform(0.001, 5.0, size=n)
    lai_litter = rng.uniform(0.001, 2.0, size=n)
    plant_mass = rng.uniform(0.5, 400.0, size=n)
    plant_foliage_mass = lai / c.SLA
    plant_length = np.cbrt(400.0 * plant_mass / 3.142e-3)
    rdepth = 0.3 * plant_length
    decay = np.exp(np.log(0.1) / (rdepth / 10.0))
    rootr = (decay[:, None] ** (zi[None, :NL] / 10.0)
             - decay[:, None] ** (zi[None, 1:NL + 1] / 10.0))

    oracle_params = [
        ref.ColumnParams(theta_s=p["theta_s"][i], hksat=p["hksat"][i],
                         bsw=p["bsw"][i], psi_s=p["psi_s"][i],
                         fmax=float(p["fmax"][i]))
        for i in range(n)
    ]
    oracle_states = [
        ref.ColumnState(h2osoi=h2osoi[i].copy(), zwt=float(zwt[i]),
                        wa=float(wa[i]), smp=smp[i].copy(),
                        lai=float(lai[i]), lai_litter=float(lai_litter[i]),
                        rootr=rootr[i].copy(),
                        plant_mass=float(plant_mass[i]),
                        plant_foliage_mass=float(plant_foliage_mass[i]))
        for i in range(n)
    ]

    f64 = jnp.float64
    params = SoilParams(
        theta_s=jnp.asarray(p["theta_s"], f64),
        hksat=jnp.asarray(p["hksat"], f64),
        lambda_=jnp.asarray(p["lambda_"], f64),
        bsw=jnp.asarray(p["bsw"], f64),
        psi_s=jnp.asarray(p["psi_s"], f64),
        theta_m=jnp.asarray(p["theta_m"], f64),
        fmax=jnp.asarray(p["fmax"], f64),
    )
    soil = SoilState(
        h2osoi_liq=jnp.asarray(h2osoi, f64),
        zwt=jnp.asarray(zwt, f64),
        wa=jnp.asarray(wa, f64),
        smp=jnp.asarray(smp, f64),
        h2osoi_liq_ma=jnp.zeros((n, NL), f64),
    )
    veg = VegState(
        plant_mass=jnp.asarray(plant_mass, f64),
        plant_foliage_mass=jnp.asarray(plant_foliage_mass, f64),
        plant_length=jnp.asarray(plant_length, f64),
        rdepth=jnp.asarray(rdepth, f64),
        lai=jnp.asarray(lai, f64),
        lai_litter=jnp.asarray(lai_litter, f64),
        rootr=jnp.asarray(rootr, f64),
        c_labile=jnp.zeros((n,), f64),
        n_labile=jnp.zeros((n,), f64),
        p_labile=jnp.zeros((n,), f64),
    )
    return oracle_params, oracle_states, params, soil, veg


def forcing_from_np(day: dict) -> Forcing:
    return Forcing(**{k: jnp.asarray(v, jnp.float64)
                      for k, v in day.items()})


@pytest.mark.parametrize("seed", [0, 1])
def test_substep_parity(layer_grid, geometry_np, seed):
    """One substep must match the oracle to float64 round-off."""
    n = 96
    zi, dz, zc = geometry_np
    op, os_, params, soil, veg = make_ensemble(n, seed, layer_grid)
    geom = Geometry(zi=tuple(map(float, zi)),
                    dz_soil=tuple(map(float, dz[:NL])),
                    zc_soil=tuple(map(float, zc[:NL])))
    dt = c.SDAY / 48.0

    day = synthetic_forcing_day(n, 100, seed)
    f = forcing_from_np(day)
    fd = derive_forcing(f)
    new_soil, fx = jax.jit(
        lambda s, v, fdd: hydrology_substep(s, v, params, fdd, geom, dt)
    )(soil, veg, fd)

    for i in range(n):
        fcol = ref.DailyForcing(**{k: float(day[k][i]) for k in day})
        fdd = ref.derived_forcing(fcol)
        fxo = ref.hydrology_substep(os_[i], op[i], fdd, zi, dz.copy(),
                                    zc.copy(), dt)
        np.testing.assert_allclose(
            np.asarray(new_soil.h2osoi_liq[i]), os_[i].h2osoi,
            rtol=1e-9, atol=1e-9, err_msg=f"h2osoi col {i}")
        np.testing.assert_allclose(
            float(new_soil.zwt[i]), os_[i].zwt, rtol=1e-9, atol=1e-11,
            err_msg=f"zwt col {i}")
        np.testing.assert_allclose(
            float(new_soil.wa[i]), os_[i].wa, rtol=1e-9, atol=1e-9,
            err_msg=f"wa col {i}")
        np.testing.assert_allclose(
            np.asarray(new_soil.smp[i]), os_[i].smp, rtol=1e-9, atol=1e-6,
            err_msg=f"smp col {i}")
        np.testing.assert_allclose(
            float(fx.residual[i]), fxo["residual"], rtol=1e-6, atol=1e-8,
            err_msg=f"residual col {i}")


def test_multiday_trajectory_parity(layer_grid, geometry_np):
    """10 days x 48 substeps + daily GROW must track the oracle."""
    n = 16
    seed = 7
    nisurf = 48
    n_days = 10
    zi, dz, zc = geometry_np
    op, os_, params, soil, veg = make_ensemble(n, seed, layer_grid)
    geom = Geometry(zi=tuple(map(float, zi)),
                    dz_soil=tuple(map(float, dz[:NL])),
                    zc_soil=tuple(map(float, zc[:NL])))
    dt = c.SDAY / nisurf

    @jax.jit
    def day_step(soil, veg, f):
        fd = derive_forcing(f)

        def body(s, _):
            s2, fx = hydrology_substep(s, veg, params, fd, geom, dt)
            return s2, fx.residual

        soil, residuals = jax.lax.scan(body, soil, None, length=nisurf)
        veg, npp, _ = grow_daily(veg, soil.smp, f.tas, geom.zi)
        return soil, veg, npp, residuals

    for d in range(n_days):
        day = synthetic_forcing_day(n, 50 + d, seed)
        f = forcing_from_np(day)
        soil, veg, npp, _ = day_step(soil, veg, f)
        for i in range(n):
            fcol = ref.DailyForcing(**{k: float(day[k][i]) for k in day})
            ref.run_day(os_[i], op[i], fcol, zi, dz.copy(), zc.copy(),
                        dt, nisurf)

    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(soil.h2osoi_liq[i]), os_[i].h2osoi,
            rtol=1e-6, atol=1e-6, err_msg=f"h2osoi col {i}")
        np.testing.assert_allclose(
            float(soil.zwt[i]), os_[i].zwt, rtol=1e-6, atol=1e-8,
            err_msg=f"zwt col {i}")
        np.testing.assert_allclose(
            float(soil.wa[i]), os_[i].wa, rtol=1e-6, atol=1e-6,
            err_msg=f"wa col {i}")
        np.testing.assert_allclose(
            float(veg.lai[i]), os_[i].lai, rtol=1e-6, atol=1e-8,
            err_msg=f"lai col {i}")
        np.testing.assert_allclose(
            float(veg.plant_mass[i]), os_[i].plant_mass, rtol=1e-6,
            err_msg=f"plant_mass col {i}")
        np.testing.assert_allclose(
            np.asarray(veg.rootr[i]), os_[i].rootr, rtol=1e-6, atol=1e-9,
            err_msg=f"rootr col {i}")


def test_grow_parity(layer_grid):
    """Daily GROW kernel matches the oracle across temperature regimes."""
    n = 64
    seed = 3
    zi = layer_grid.zi
    op, os_, params, soil, veg = make_ensemble(n, seed, layer_grid)
    tas = np.linspace(250.0, 320.0, n)     # spans both fT branches
    new_veg, npp, _lf = jax.jit(
        lambda v, s, t: grow_daily(v, s, t, jnp.asarray(zi))
    )(veg, soil.smp, jnp.asarray(tas, jnp.float64))
    for i in range(n):
        gx = ref.grow_daily(os_[i], float(tas[i]), zi)
        np.testing.assert_allclose(float(npp[i]), gx["npp"], rtol=1e-9,
                                   atol=1e-12, err_msg=f"npp col {i}")
        np.testing.assert_allclose(float(new_veg.lai[i]), os_[i].lai,
                                   rtol=1e-9, err_msg=f"lai col {i}")
        np.testing.assert_allclose(np.asarray(new_veg.rootr[i]),
                                   os_[i].rootr, rtol=1e-9, atol=1e-12,
                                   err_msg=f"rootr col {i}")
