"""Adjoint calibration + vmapped ensemble (calibrate.py, ensemble.py).

These are beyond-reference capabilities: the Fortran model's calibration
workflow was manual parameter sweeps diffed by hand (reference
notes.txt Nov-Dec 2016) and its model-vs-obs ET comparison was visual
(HYBRID9.f90:449).  Here both are closed loops: autodiff through the
production day step, and a one-vmap parameter ensemble.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid9_tpu.calibrate import (CalibrationSpec, apply_multipliers,
                                   calibrate, et_loss,
                                   parameter_sensitivity,
                                   simulate_daily_et)
from hybrid9_tpu.data.synthetic import (synthetic_forcing_day,
                                        synthetic_soil_params)
from hybrid9_tpu.ensemble import (ensemble_spread, perturbed_multipliers,
                                  run_ensemble)
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.physics.hydrology import Geometry
from hybrid9_tpu.state import Forcing, SoilParams, initial_state
from hybrid9_tpu.step import day_step

NL = c.NSOIL_LAYERS
N = 12
NDAYS = 5
NISURF = 16


@pytest.fixture(scope="module")
def problem(layer_grid):
    p = synthetic_soil_params(N, seed=3)
    params = SoilParams(**{k: jnp.asarray(v, jnp.float64)
                           for k, v in p.items()})
    state0 = initial_state(params, layer_grid.dz, layer_grid.zi,
                           dtype=jnp.float64)
    geom = Geometry(zi=tuple(map(float, layer_grid.zi)),
                    dz_soil=tuple(map(float, layer_grid.dz[:NL])),
                    zc_soil=tuple(map(float, layer_grid.zc[:NL])))
    days = [synthetic_forcing_day(N, 120 + d, seed=3)
            for d in range(NDAYS)]
    forcing = Forcing(**{k: jnp.stack([jnp.asarray(d[k], jnp.float64)
                                       for d in days])
                         for k in days[0]})
    return params, state0, geom, forcing


def test_apply_multipliers_identity_and_consistency(problem):
    params, _, _, _ = problem
    zero = {"hksat": jnp.zeros(()), "bsw": jnp.zeros(()),
            "psi_s": jnp.zeros(())}
    same = apply_multipliers(params, zero)
    np.testing.assert_array_equal(np.asarray(same.hksat),
                                  np.asarray(params.hksat))
    np.testing.assert_array_equal(np.asarray(same.psi_s),
                                  np.asarray(params.psi_s))
    # bsw scaling keeps the (bsw, lambda_) pair consistent and the
    # psi_s sign convention (negative mm) is preserved.
    scaled = apply_multipliers(params, {"bsw": jnp.asarray(0.4),
                                        "psi_s": jnp.asarray(0.2)})
    np.testing.assert_allclose(np.asarray(scaled.lambda_),
                               1.0 / np.asarray(scaled.bsw), rtol=1e-12)
    assert np.all(np.asarray(scaled.psi_s) < 0.0)
    with pytest.raises(ValueError):
        apply_multipliers(params, {"theta_s": jnp.zeros(())})


def test_sensitivity_gradients_flow(problem):
    """Per-cell adjoint sensitivities exist, are finite, and are not
    identically zero for the conductivity/retention parameters."""
    params, state0, geom, forcing = problem
    sens = parameter_sensitivity(params, state0, forcing, geom,
                                 fields=("hksat", "bsw", "psi_s"),
                                 nisurf=NISURF)
    for f, g in sens.items():
        g = np.asarray(g)
        assert g.shape == (N,), f
        assert np.all(np.isfinite(g)), f
    # The retention exponent must influence ET somewhere on the grid.
    assert np.max(np.abs(np.asarray(sens["bsw"]))) > 0.0


def test_calibration_recovers_perturbation(problem):
    """Generate obs from perturbed-truth params; fitting from zero must
    cut the ET misfit by well over half and move toward the truth."""
    params, state0, geom, forcing = problem
    truth = {"bsw": jnp.asarray(0.35, jnp.float64),
             "psi_s": jnp.asarray(-0.5, jnp.float64)}
    obs = simulate_daily_et(truth, params, state0, forcing, geom,
                            nisurf=NISURF)
    res = calibrate(params, state0, forcing, geom, obs,
                    spec=CalibrationSpec(fields=("bsw", "psi_s")),
                    nisurf=NISURF, steps=30, learning_rate=0.1)
    hist = np.asarray(res.loss_history)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < 0.4 * hist[0], (hist[0], hist[-1])
    # The fitted multipliers move in the truth's direction.
    assert float(res.theta["bsw"]) > 0.0
    assert float(res.theta["psi_s"]) < 0.0


def test_obs_mask_weights_loss(problem):
    params, state0, geom, forcing = problem
    theta = CalibrationSpec(fields=("hksat",)).init_theta(
        N, jnp.float64)
    obs = jnp.zeros((NDAYS, N), jnp.float64)
    full = et_loss(theta, params, state0, forcing, geom, obs,
                   nisurf=NISURF)
    none = et_loss(theta, params, state0, forcing, geom, obs,
                   nisurf=NISURF,
                   obs_mask=jnp.zeros((NDAYS, N), bool))
    assert float(full) > 0.0
    assert float(none) == 0.0


def test_cli_calibrate_smoke(tmp_path):
    """End-to-end `calibrate` subcommand: climate + obs CSVs in, fitted
    multiplier JSON out."""
    import json

    from hybrid9_tpu.cli import main
    from hybrid9_tpu.data.synthetic import synthetic_forcing_day

    cpath = tmp_path / "climate.csv"
    opath = tmp_path / "obs.csv"
    out = tmp_path / "fit.json"
    cols = ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs")
    with open(cpath, "w") as f:
        f.write(",".join(cols) + "\n")
        for d in range(8):
            day = synthetic_forcing_day(1, 150 + d, seed=5)
            f.write(",".join(f"{float(day[k][0]):.8g}"
                             for k in cols) + "\n")
    with open(opath, "w") as f:
        f.write("doy,evap_obs\n")
        for d in range(8):
            f.write(f"{d + 1},1.5\n")

    rc = main(["calibrate", "--climate", str(cpath), "--obs",
               str(opath), "--fields", "hksat,bsw", "--steps", "2",
               "--lr", "0.05", "--nisurf", "8", "--out", str(out)])
    assert rc == 0
    fit = json.loads(out.read_text())
    assert set(fit["multipliers"]) == {"hksat", "bsw"}
    assert fit["obs_days"] == 8
    assert np.isfinite(fit["loss_final"])


def test_ensemble_member0_matches_control(problem):
    """vmapped member 0 (theta = 0) must equal the plain scan run."""
    params, state0, geom, forcing = problem
    theta = perturbed_multipliers(jax.random.PRNGKey(0), 3,
                                  sigma=0.4)
    theta = {k: v.astype(jnp.float64) for k, v in theta.items()}
    res = run_ensemble(theta, params, state0, forcing, geom,
                       nisurf=NISURF)
    assert res.evap.shape == (3, NDAYS, N)

    dt = c.SDAY / NISURF

    def body(state, f_day):
        state, diags = day_step(state, f_day, params, geom, dt, NISURF)
        return state, diags["evap_day"]

    _, control = jax.lax.scan(body, state0, forcing)
    np.testing.assert_allclose(np.asarray(res.evap[0]),
                               np.asarray(control), rtol=1e-10,
                               atol=1e-12)
    # Perturbed members genuinely differ from the control.
    mean, std = ensemble_spread(res.evap)
    assert mean.shape == (NDAYS, N)
    assert float(jnp.max(std)) > 0.0


def test_ensemble_annual_folded_matches_stacked(problem):
    """The folded-cell-axis annual ensemble (run_ensemble_annual, the
    production path: members become batch on the packed axis) must
    reproduce the vmapped ensemble's daily sums member-for-member."""
    from hybrid9_tpu.ensemble import run_ensemble_annual
    params, state0, geom, forcing = problem
    theta = perturbed_multipliers(jax.random.PRNGKey(7), 3, sigma=0.4)
    theta = {k: v.astype(jnp.float64) for k, v in theta.items()}
    full = run_ensemble(theta, params, state0, forcing, geom,
                        nisurf=NISURF)
    ann = run_ensemble_annual(theta, params, state0, forcing, geom,
                              nisurf=NISURF)
    assert ann["evap"].shape == (3, N)
    np.testing.assert_allclose(np.asarray(ann["evap"]),
                               np.asarray(full.evap.sum(axis=1)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ann["npp"]),
                               np.asarray(full.npp.sum(axis=1)),
                               rtol=1e-10, atol=1e-10)
