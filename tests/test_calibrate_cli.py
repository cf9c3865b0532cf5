"""Global-model calibration + ensemble through the CLI (VERDICT r2
item 5): `calibrate --config` fits the real load_soil parameter set on
the production grid (scalar or per-cell multipliers), and `ensemble`
runs a parameter-perturbed ensemble of a configured year in one vmapped
kernel with spread diagnostics written to NetCDF.
"""

import json
import os

import numpy as np
import pytest

from hybrid9_tpu.cli import main
from hybrid9_tpu.config import Config


@pytest.fixture(scope="module")
def cfg_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("cal")
    cfg = Config(resolution_deg=24.0, start_year=1901, end_year=1901,
                 forcing_block_days=92, cell_block=16, nisurf=4,
                 use_pallas=False, output_path=str(d))
    p = d / "cfg.json"
    p.write_text(cfg.to_json())
    return str(p), str(d)


def test_calibrate_global_twin_scalar(cfg_path):
    """Twin experiment on the real grid: a known hksat multiplier is
    recovered from model-generated observations."""
    p, d = cfg_path
    out = os.path.join(d, "fit.json")
    rc = main(["calibrate", "--config", p, "--obs-twin", "0.4",
               "--fields", "hksat", "--days", "10", "--steps", "40",
               "--lr", "0.15", "--out", out])
    assert rc == 0
    with open(out) as f:
        fit = json.load(f)
    assert fit["loss_final"] < 0.05 * fit["loss_initial"]
    # exp(0.4) = 1.49; recovery within ~15 %.
    assert fit["multipliers"]["hksat"] == pytest.approx(np.exp(0.4),
                                                        rel=0.15)


def test_calibrate_global_per_cell(cfg_path):
    """--per-cell fits one multiplier per packed cell (spatial
    inversion) and writes an npz of per-cell multipliers."""
    p, d = cfg_path
    out = os.path.join(d, "fit_cells.npz")
    rc = main(["calibrate", "--config", p, "--obs-twin", "0.3",
               "--per-cell", "--fields", "hksat", "--days", "10",
               "--steps", "30", "--lr", "0.15", "--out", out])
    assert rc == 0
    with np.load(out) as z:
        mult = z["hksat"]
        n_land = int(z["n_land"])
        hist = z["loss_history"]
    assert mult.ndim == 1 and mult.shape[0] >= n_land
    assert hist[-1] < hist[0]
    # Cells with usable ET signal move toward exp(0.3); the median land
    # multiplier should be well off the 1.0 prior.
    med = float(np.median(mult[:n_land]))
    assert 1.05 < med < np.exp(0.3) * 1.3


def test_ensemble_cli(cfg_path):
    p, d = cfg_path
    out = os.path.join(d, "ens.nc")
    rc = main(["ensemble", "--config", p, "--members", "4",
               "--days", "8", "--out", out, "--cache-dir", ""])
    assert rc == 0
    from hybrid9_tpu.io import netcdf
    back = netcdf.read_grid_file(out, ["evap_mean", "evap_std",
                                       "evap_control", "runoff_mean",
                                       "npp_std"])
    land = np.isfinite(back["evap_mean"])
    assert land.sum() > 0
    # Perturbed members genuinely spread.
    assert np.nanmax(back["evap_std"]) > 0.0
    # Member 0 is the unperturbed control: finite and within the
    # spread's neighborhood of the mean.
    assert np.all(np.isfinite(back["evap_control"][land]))


def test_assimilate_cli_twin(cfg_path):
    """`assimilate --config --obs-twin`: the EnSRF twin run recovers a
    known hksat log-multiplier (VERDICT r3 item 1) and writes the
    posterior npz."""
    p, d = cfg_path
    out = os.path.join(d, "enkf.npz")
    rc = main(["assimilate", "--config", p, "--obs-twin", "0.5",
               "--days", "20", "--members", "12", "--out", out])
    assert rc == 0
    with np.load(out) as z:
        tm = z["theta_mean"]
        ts = z["theta_std"]
        mult = z["hksat_multiplier"]
        n_land = int(z["n_land"])
    assert tm.shape == (n_land,) and np.all(np.isfinite(tm))
    assert np.all(np.isfinite(ts)) and np.all(ts >= 0.0)
    # Cells with ET signal pull the posterior toward log-mult 0.5
    # (multiplier e^0.5 = 1.65): the upper half of the movement
    # distribution should be clearly off the 1.0 prior.
    top = np.sort(mult)[n_land // 2:]
    assert float(np.median(top)) > 1.05
    # Nothing diverged: multipliers stay inside the filter clamp.
    assert np.all(np.abs(tm) <= 2.0)
