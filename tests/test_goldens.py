"""Golden-trajectory regression tests.

The parity tests compare the vectorized kernels against the oracle; these
goldens pin BOTH against committed trajectories (tests/goldens/*.npz,
generated from the float64 oracle), so a change that drifts oracle and
kernels together cannot slip through silently.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid9_tpu.config import LayerGrid
from hybrid9_tpu.data.synthetic import synthetic_forcing_day
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics import reference_column as ref
from hybrid9_tpu.physics.grow import grow_daily
from hybrid9_tpu.physics.hydrology import (Geometry, derive_forcing,
                                           hydrology_substep)
from hybrid9_tpu.state import Forcing, SoilParams, SoilState, VegState

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(tag):
    return np.load(os.path.join(GOLDEN_DIR, f"column_{tag}.npz"))


@pytest.mark.parametrize("tag", ["8layer", "20layer"])
def test_oracle_matches_golden(tag):
    d = _load(tag)
    g = LayerGrid.from_interfaces(tuple(d["zi"]))
    nl = g.nsoil
    params = ref.ColumnParams(theta_s=d["theta_s"], hksat=d["hksat"],
                              bsw=d["bsw"], psi_s=d["psi_s"],
                              fmax=float(d["fmax"]))
    st = ref.ColumnState(
        h2osoi=d["h0"].copy(), zwt=2.0, wa=4000.0, smp=d["smp0"].copy(),
        lai=1.5, lai_litter=0.2, rootr=d["rootr"].copy(),
        plant_mass=10.0, plant_foliage_mass=1.5 / 0.023)
    seed = int(d["seed"])
    for day in range(int(d["n_days"])):
        fday = synthetic_forcing_day(1, day + 1, seed=seed)
        f = ref.DailyForcing(**{k: float(v[0]) for k, v in fday.items()})
        ref.run_day(st, params, f, g.zi, g.dz.copy(), g.zc.copy(),
                    1800.0, 48)
        np.testing.assert_allclose(st.h2osoi, d["h"][day], rtol=1e-10,
                                   err_msg=f"{tag} day {day}")
        np.testing.assert_allclose(st.zwt, d["zwt"][day], rtol=1e-10)
    np.testing.assert_allclose(st.lai, d["lai"][-1], rtol=1e-10)


@pytest.mark.parametrize("tag", ["8layer", "20layer"])
def test_vector_kernel_matches_golden(tag):
    d = _load(tag)
    g = LayerGrid.from_interfaces(tuple(d["zi"]))
    nl = g.nsoil
    f64 = jnp.float64
    params = SoilParams(
        theta_s=jnp.asarray(d["theta_s"][None], f64),
        hksat=jnp.asarray(d["hksat"][None], f64),
        lambda_=jnp.asarray(d["lambda_"][None], f64),
        bsw=jnp.asarray(d["bsw"][None], f64),
        psi_s=jnp.asarray(d["psi_s"][None], f64),
        theta_m=jnp.zeros((1, nl), f64),
        fmax=jnp.asarray([d["fmax"]], f64))
    soil = SoilState(h2osoi_liq=jnp.asarray(d["h0"][None], f64),
                     zwt=jnp.asarray([2.0], f64),
                     wa=jnp.asarray([4000.0], f64),
                     smp=jnp.asarray(d["smp0"][None], f64),
                     h2osoi_liq_ma=jnp.zeros((1, nl), f64))
    veg = VegState(
        plant_mass=jnp.asarray([10.0], f64),
        plant_foliage_mass=jnp.asarray([1.5 / 0.023], f64),
        plant_length=jnp.asarray([100.0], f64),
        rdepth=jnp.asarray([30.0], f64),
        lai=jnp.asarray([1.5], f64),
        lai_litter=jnp.asarray([0.2], f64),
        rootr=jnp.asarray(d["rootr"][None], f64),
        c_labile=jnp.zeros(1, f64), n_labile=jnp.zeros(1, f64),
        p_labile=jnp.zeros(1, f64))
    geom = Geometry(zi=tuple(map(float, g.zi)),
                    dz_soil=tuple(map(float, g.dz[:nl])),
                    zc_soil=tuple(map(float, g.zc[:nl])))
    dt = c.SDAY / 48.0
    seed = int(d["seed"])

    @jax.jit
    def day(soil, veg, f):
        fd = derive_forcing(f)

        def body(s, _):
            s2, _ = hydrology_substep(s, veg, params, fd, geom, dt)
            return s2, None

        soil, _ = jax.lax.scan(body, soil, None, length=48)
        veg, _, _ = grow_daily(veg, soil.smp, f.tas, geom.zi)
        return soil, veg

    for dday in range(int(d["n_days"])):
        fday = synthetic_forcing_day(1, dday + 1, seed=seed)
        f = Forcing(**{k: jnp.asarray(v, f64) for k, v in fday.items()})
        soil, veg = day(soil, veg, f)
    np.testing.assert_allclose(np.asarray(soil.h2osoi_liq[0]),
                               d["h"][-1], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(soil.zwt[0]), d["zwt"][-1],
                               rtol=1e-6)
    np.testing.assert_allclose(float(veg.lai[0]), d["lai"][-1],
                               rtol=1e-6)
