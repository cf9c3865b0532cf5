"""Reference-format LCLIM site-file adapters (VERDICT r2 item 8).

The reference's site harness reads positional CSVs: a daily record
(unit 10, HYBRID9.f90:368-379) and a 37-column sub-daily record
(unit 11, HYBRID9.f90:426-460), with the Vaira LAI phenology embedded
per calendar year (HYBRID9.f90:380-417).  These tests synthesize files
in exactly that layout and drive the production-kernel site engine
through them — the like-for-like validation path a reference-era site
record drops into.  Also covers the kernel engine's production-default
configuration (zd09_every=8 + snow), new in r3.
"""

import numpy as np
import pytest

from hybrid9_tpu.config import Config
from hybrid9_tpu.physics import constants as c
from hybrid9_tpu.site import (VAIRA_LAI_WAYPOINTS, read_lclim_daily_csv,
                              read_lclim_subdaily_csv, run_site)

NISURF = 8
NDAYS = 10


def _write_lclim_daily(path, ndays=NDAYS):
    rows = ["doy evap pr tas rh huss ps   (positional header)"]
    for d in range(1, ndays + 1):
        # doy, evap_obs (mm/day), pr (mm/day), tas (C), rh (%),
        # huss (kg/kg), ps (Pa)
        rows.append(f"{d} {1.5 + 0.1 * d} {2.0 if d % 3 == 0 else 0.0} "
                    f"{12.0 + d * 0.5} {65.0} {0.008} {101300.0}")
    path.write_text("\n".join(rows) + "\n")


def _write_lclim_subdaily(path, ndays=NDAYS, nisurf=NISURF):
    lines = [" ".join(f"c{i}" for i in range(37))]
    for d in range(1, ndays + 1):
        for s in range(nisurf):
            cols = [0.0] * 37
            daylight = max(0.0, np.sin(np.pi * (s + 0.5) / nisurf))
            cols[11] = 60.0 * daylight            # 12: obs LE (W/m^2)
            cols[13] = 250.0 * daylight           # 14: Rnet (W/m^2)
            cols[15] = 120.0 * daylight           # 16: PAR (W/m^2)
            cols[21] = 10.0 + 8.0 * daylight      # 22: T (C)
            cols[24] = 70.0 - 20.0 * daylight     # 25: RH (%)
            cols[34] = 0.4 if (d % 3 == 0 and s == 2) else 0.0  # 35: mm
            lines.append(" ".join(f"{v:.4f}" for v in cols))
    path.write_text("\n".join(lines) + "\n")


def test_daily_adapter_units(tmp_path):
    p = tmp_path / "lclim_daily.csv"
    _write_lclim_daily(p)
    days, obs = read_lclim_daily_csv(p)
    assert len(days) == NDAYS
    # tas C -> K, pr mm/day -> mm/s (HYBRID9.f90:374-376).
    assert days[0].tas == pytest.approx(12.5 + c.TF)
    assert days[2].pr == pytest.approx(2.0 / c.SDAY)
    assert days[0].rhs == pytest.approx(65.0)
    assert obs[1] == pytest.approx(1.6)
    assert obs[NDAYS] == pytest.approx(1.5 + 0.1 * NDAYS)


def test_subdaily_adapter_columns(tmp_path):
    p = tmp_path / "lclim_sub.csv"
    _write_lclim_subdaily(p)
    sub = read_lclim_subdaily_csv(p, NISURF)
    assert set(sub) == set(range(1, NDAYS + 1))
    dt = c.SDAY / NISURF
    ov = sub[3][2]                        # day 3, third substep: rain
    assert ov["forc_rain"] == pytest.approx(0.4 / dt)
    daylight = np.sin(np.pi * 2.5 / NISURF)
    assert ov["tak"] == pytest.approx(10.0 + 8.0 * daylight + c.TF,
                                      abs=1e-3)
    assert ov["rnet"] == pytest.approx(250.0 * daylight, abs=1e-2)
    # Observed LE W/m^2 -> mm per substep via the reference's lamb(T)
    # (HYBRID9.f90:445-450).
    tak = 10.0 + 8.0 * daylight + c.TF
    lamb = (2503.0 - 2.386 * (tak - c.TF)) * 1.0e3
    expect = (60.0 * daylight / lamb) * 1.0e3 / c.RHOW * dt
    assert ov["evap_obs"] == pytest.approx(expect, rel=1e-3)


def test_lclim_end_to_end_cli(tmp_path):
    """A reference-format record drops into `site --engine kernel`."""
    from hybrid9_tpu.cli import main
    pd = tmp_path / "daily.csv"
    ps = tmp_path / "sub.csv"
    _write_lclim_daily(pd)
    _write_lclim_subdaily(ps)
    out = tmp_path / "site.csv"
    rc = main(["site", "--lclim-daily", str(pd),
               "--lclim-subdaily", str(ps), "--lclim-year", "2002",
               "--nisurf", str(NISURF), "--engine", "kernel",
               "--csv-out", str(out)])
    assert rc == 0
    txt = out.read_text().splitlines()
    header = txt[0].split(",")
    assert "evap_obs" in header           # obs comparison column
    rows = [dict(zip(header, r.split(","))) for r in txt[1:]]
    assert len(rows) == NDAYS
    # Vaira-2002 phenology applied: doy 1 waypoint pins LAI to 0.88.
    assert float(rows[0]["lai"]) == pytest.approx(
        VAIRA_LAI_WAYPOINTS[2002][1], abs=1e-3)
    for r in rows:
        assert np.isfinite(float(r["evap_day"]))
        assert abs(float(r["max_residual"])) < 0.1 if "max_residual" \
            in r else True


def test_kernel_production_default_config():
    """The kernel site engine honors zd09_every/snow (production
    defaults) — trajectories stay close to exact mode and conserve."""
    exact = run_site(Config(spinup_years=0, nisurf=NISURF,
                            zd09_every=1, snow=False),
                     engine="kernel")
    prod = run_site(Config(spinup_years=0, nisurf=NISURF,
                           zd09_every=8, snow=True),
                    engine="kernel")
    e = np.array([r["evap_day"] for r in exact.daily])
    p = np.array([r["evap_day"] for r in prod.daily])
    assert np.all(np.isfinite(p))
    # Production approximations move daily ET only slightly (the 4-
    # hourly ZD09 refresh costs <0.5 mm of layer trajectory over 20
    # days, DEVIATIONS.md; one spring day at the default synthetic site
    # reaches ~0.32 mm/day of ET difference).
    assert float(np.max(np.abs(p - e))) < 0.5          # mm/day
    worst = max(r["max_residual"] for r in prod.daily)
    assert worst < 0.1                                  # reference bound
