"""Arbitrary layer counts (BASELINE config 1: 20-layer single column).

The reference hardcodes 8 soil layers + aquifer; the framework derives the
layer count from the configured interface depths, so a 20-layer column is
just a different ``zi``.  Oracle and vector kernels must agree at any
layer count, and conservation must hold through a 1-year spin-up.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid9_tpu.config import Config, LayerGrid, exponential_interfaces
from hybrid9_tpu.data.synthetic import (synthetic_forcing_day,
                                        synthetic_soil_params)
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics import reference_column as ref
from hybrid9_tpu.physics.hydrology import (Geometry, derive_forcing,
                                           hydrology_substep)
from hybrid9_tpu.site import run_site
from hybrid9_tpu.state import Forcing, SoilParams, SoilState, VegState


def test_exponential_interfaces():
    zi = exponential_interfaces(20)
    assert len(zi) == 22          # 20 soil + aquifer => 21 interfaces + 0
    assert zi[0] == 0.0
    assert abs(zi[-2] - 2296.0) < 1e-6
    assert zi[-1] == 5000.0
    assert np.all(np.diff(zi) > 0)
    grid = LayerGrid.from_interfaces(zi)
    assert grid.nsoil == 20


def test_single_column_20_layers_spinup():
    """BASELINE config 1: 20-layer column, synthetic forcing, 1-yr
    spin-up; water balance closes."""
    cfg = Config(zi_mm=exponential_interfaces(20), spinup_years=1,
                 nisurf=48)
    result = run_site(cfg)
    assert len(result.daily) == 365
    worst = max(r["max_residual"] for r in result.daily)
    assert worst < 1e-6, f"f64 20-layer residual {worst} mm"
    theta1 = [r["theta1"] for r in result.daily]
    assert all(0.0 < t < 0.6 for t in theta1)


def test_vector_matches_oracle_20_layers():
    """Vectorized substep parity at a non-default layer count."""
    n = 24
    nl = 20
    zi_t = exponential_interfaces(nl)
    grid = LayerGrid.from_interfaces(zi_t)
    zi, dz, zc = grid.zi, grid.dz, grid.zc
    rng = np.random.RandomState(5)
    p = synthetic_soil_params(n, seed=5, n_layers=nl)
    frac = rng.uniform(0.15, 0.98, size=(n, nl))
    h2osoi = frac * p["theta_s"] * dz[None, :nl]
    zwt = 10.0 ** rng.uniform(np.log10(0.05), np.log10(12.0), size=n)
    wa = rng.uniform(2500.0, 5000.0, size=n)
    smp = np.maximum(c.SMPMIN,
                     p["psi_s"] * np.clip(frac, 0.01, 1.0) ** (-p["bsw"]))
    lai = rng.uniform(0.001, 4.0, size=n)
    rdepth = np.full(n, 300.0)
    decay = np.exp(np.log(0.1) / (rdepth / 10.0))
    rootr = (decay[:, None] ** (zi[None, :nl] / 10.0)
             - decay[:, None] ** (zi[None, 1:nl + 1] / 10.0))

    f64 = jnp.float64
    params = SoilParams(**{k: jnp.asarray(v, f64) for k, v in p.items()})
    soil = SoilState(h2osoi_liq=jnp.asarray(h2osoi, f64),
                     zwt=jnp.asarray(zwt, f64), wa=jnp.asarray(wa, f64),
                     smp=jnp.asarray(smp, f64),
                     h2osoi_liq_ma=jnp.zeros((n, nl), f64))
    veg = VegState(
        plant_mass=jnp.ones((n,), f64),
        plant_foliage_mass=jnp.full((n,), 0.0435, f64),
        plant_length=jnp.full((n,), 50.0, f64),
        rdepth=jnp.asarray(rdepth, f64),
        lai=jnp.asarray(lai, f64),
        lai_litter=jnp.full((n,), 0.3, f64),
        rootr=jnp.asarray(rootr, f64),
        c_labile=jnp.zeros((n,), f64), n_labile=jnp.zeros((n,), f64),
        p_labile=jnp.zeros((n,), f64))
    geom = Geometry(zi=tuple(map(float, zi)),
                    dz_soil=tuple(map(float, dz[:nl])),
                    zc_soil=tuple(map(float, zc[:nl])))
    dt = c.SDAY / 48.0
    day = synthetic_forcing_day(n, 120, 5)
    f = Forcing(**{k: jnp.asarray(v, f64) for k, v in day.items()})
    fd = derive_forcing(f)
    new_soil, fx = jax.jit(
        lambda s: hydrology_substep(s, veg, params, fd, geom, dt))(soil)

    for i in range(n):
        op = ref.ColumnParams(theta_s=p["theta_s"][i],
                              hksat=p["hksat"][i], bsw=p["bsw"][i],
                              psi_s=p["psi_s"][i],
                              fmax=float(p["fmax"][i]))
        os_ = ref.ColumnState(
            h2osoi=h2osoi[i].copy(), zwt=float(zwt[i]), wa=float(wa[i]),
            smp=smp[i].copy(), lai=float(lai[i]), lai_litter=0.3,
            rootr=rootr[i].copy(), plant_mass=1.0,
            plant_foliage_mass=0.0435)
        fcol = ref.DailyForcing(**{k: float(day[k][i]) for k in day})
        ref.hydrology_substep(os_, op, ref.derived_forcing(fcol), zi,
                              dz.copy(), zc.copy(), dt)
        np.testing.assert_allclose(np.asarray(new_soil.h2osoi_liq[i]),
                                   os_.h2osoi, rtol=1e-9, atol=1e-9,
                                   err_msg=f"h2osoi col {i}")
        np.testing.assert_allclose(float(new_soil.zwt[i]), os_.zwt,
                                   rtol=1e-9, atol=1e-11,
                                   err_msg=f"zwt col {i}")
