"""Site mode on the production kernels vs the float64 oracle.

The reference validates the real model at flux-tower sites (the LCLIM
branch, HYBRID9.f90:339-484).  These tests assert that the kernel-backed
site engine (`run_site(engine="kernel")`) — which drives the SAME jitted
`hydrology_substep`/`grow_daily` code the global TPU run uses — tracks
the float64 NumPy oracle, including under sub-daily observation
overrides, prescribed-LAI phenology, and the observed-ET comparison
column.
"""

import csv

import numpy as np
import pytest

from hybrid9_tpu.config import Config
from hybrid9_tpu.site import read_site_subdaily_csv, run_site

TRACK_KEYS = ("evap_day", "evap_grnd_day", "theta1", "theta2", "theta3",
              "theta4", "lai", "w_i", "f_t")


def _cfg(**kw):
    # Exact mode for oracle comparisons: the oracle refreshes the ZD09
    # profile every substep and has no snow store, so pin both off
    # (the kernel engine honors the production defaults since r3).
    base = dict(spinup_years=0, nisurf=8, dtype="float64",
                zd09_every=1, snow=False)
    base.update(kw)
    return Config(**base)


def _compare(oracle, kernel, days, atol=1e-8, rtol=1e-6):
    assert len(oracle.daily) == len(kernel.daily) == days
    for key in TRACK_KEYS:
        a = np.array([r[key] for r in oracle.daily])
        b = np.array([r[key] for r in kernel.daily])
        np.testing.assert_allclose(b, a, atol=atol, rtol=rtol,
                                   err_msg=f"site engine mismatch: {key}")


def test_kernel_engine_matches_oracle():
    """365 coupled days: kernel engine == oracle to f64 round-off drift."""
    cfg = _cfg()
    oracle = run_site(cfg, engine="oracle")
    kernel = run_site(cfg, engine="kernel")
    _compare(oracle, kernel, 365, atol=1e-7, rtol=1e-5)
    worst = max(r["max_residual"] for r in kernel.daily)
    assert worst < 0.1  # the reference's own conservation bound (mm)


def test_kernel_engine_float32_tracks_oracle():
    """The production dtype (f32) stays within loose tolerance of the
    f64 oracle over a 60-day trajectory."""
    cfg = _cfg(dtype="float32")
    oracle = run_site(cfg, engine="oracle")
    kernel = run_site(cfg, engine="kernel")
    for key in ("theta1", "theta2", "theta3", "theta4"):
        a = np.array([r[key] for r in oracle.daily][:60])
        b = np.array([r[key] for r in kernel.daily][:60])
        np.testing.assert_allclose(b, a, atol=5e-3,
                                   err_msg=f"f32 site drift: {key}")


def test_kernel_engine_subdaily_and_obs(tmp_path):
    """Sub-daily obs overrides steer the kernel engine identically to the
    oracle, and evap_obs becomes a CSV comparison column."""
    nisurf = 8
    path = tmp_path / "obs.csv"
    with open(path, "w") as f:
        f.write("doy,step,tak,rnet,ppt,evap_obs\n")
        for step in range(1, nisurf + 1):
            f.write(f"10,{step},300.0,400.0,1.0,0.25\n")
    sub = read_site_subdaily_csv(str(path), nisurf)

    cfg = _cfg(nisurf=nisurf)
    out_o = tmp_path / "site_o.csv"
    out_k = tmp_path / "site_k.csv"
    oracle = run_site(cfg, subdaily=sub, grow=False,
                      csv_out=str(out_o), engine="oracle")
    kernel = run_site(cfg, subdaily=sub, grow=False,
                      csv_out=str(out_k), engine="kernel")
    _compare(oracle, kernel, 365, atol=1e-7, rtol=1e-5)

    # The override day must differ from an un-overridden run.
    plain = run_site(cfg, grow=False, engine="kernel")
    d10 = kernel.daily[9]
    assert d10["evap_day"] != pytest.approx(
        plain.daily[9]["evap_day"], rel=1e-6)

    # evap_obs column: daily sum of the per-substep observations.
    for res, out in ((oracle, out_o), (kernel, out_k)):
        assert res.daily[9]["evap_obs"] == pytest.approx(0.25 * nisurf)
        assert np.isnan(res.daily[11]["evap_obs"])
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert "evap_obs" in rows[0]
        assert float(rows[9]["evap_obs"]) == pytest.approx(2.0)


def test_kernel_engine_lai_waypoints():
    """Prescribed-LAI phenology (HYBRID9.f90:380-417) in kernel mode."""
    cfg = _cfg()
    waypoints = {100: 2.5, 200: 0.5}
    oracle = run_site(cfg, lai_waypoints=waypoints, grow=False,
                      engine="oracle")
    kernel = run_site(cfg, lai_waypoints=waypoints, grow=False,
                      engine="kernel")
    assert kernel.daily[100]["lai"] == pytest.approx(2.5)
    assert kernel.daily[200]["lai"] == pytest.approx(0.5)
    _compare(oracle, kernel, 365, atol=1e-7, rtol=1e-5)


def test_unknown_engine_raises():
    with pytest.raises(ValueError):
        run_site(_cfg(), engine="fortran")
