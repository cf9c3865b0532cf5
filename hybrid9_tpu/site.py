"""Single-column site mode: the LCLIM / INTERACTIVE analog.

TPU-native replacement for the reference's site-scale validation harness
(SOURCE/HYBRID9.f90:339-484 LCLIM branch; INTERACTIVE focus-cell mode,
INIT.f90:220-236): one column, driven by site climate (CSV file or the
synthetic generator), with a spin-up loop and daily CSV diagnostics in
the reference's column layout (HYBRID9.f90:223-228: year, doy, evap_day,
evap_grnd_day, theta(1..4), theta_ma(1), LAI, LAI_litter, w_i, fT).

Runs on the float64 column oracle — no compile step, bitwise-stable, and
the same code path the parity tests validate the TPU kernels against.
"""

from __future__ import annotations

import csv
import dataclasses
from typing import Dict, Iterable, List, Optional

import numpy as np

from .config import Config, LayerGrid
from .data.synthetic import synthetic_forcing_day, synthetic_soil_params
from .physics import constants as c
from .physics import reference_column as ref
from .utils.logging import get_logger

log = get_logger(__name__)

CSV_HEADER = ["year", "doy", "evap_day", "evap_grnd_day", "theta1",
              "theta2", "theta3", "theta4", "theta_ma1", "lai",
              "lai_litter", "w_i", "f_t"]

# Debug-site library: the reference keeps a commented catalogue of
# focus points for INTERACTIVE runs (EXECUTE/driver.txt:28-60).  Same
# sites, as (lon_east, lat_north) for Config.site_lon/site_lat.
DEBUG_SITES: Dict[str, tuple] = {
    "vaira": (-120.95, 38.41),          # Vaira Ranch, CA (LCLIM site)
    "sarawak": (114.0, 2.5),            # Borneo rainforest
    "kalahari": (21.5, -23.0),          # semi-arid (NISURF stability site)
    "cambridge": (0.1, 52.2),           # temperate maritime
    "harvard_forest": (-72.17, 42.54),  # temperate deciduous
    "sahara": (10.0, 23.0),             # hyper-arid
    "indonesia": (117.0, 0.5),          # humid tropics
}


@dataclasses.dataclass
class SiteResult:
    daily: List[Dict[str, float]]
    state: ref.ColumnState


def _initial_column(params: ref.ColumnParams, grid: LayerGrid
                    ) -> ref.ColumnState:
    """Fresh-init column state (INIT.f90:707-811)."""
    nl = grid.nsoil
    dz = grid.dz[:nl]
    h2osoi = 0.4 * params.theta_s * dz
    s = np.full(nl, 0.4)
    smp = np.maximum(c.SMPMIN, params.psi_s * s ** (-params.bsw))
    plant_mass = 1.0
    foliage = 0.0435
    length = np.cbrt(400.0 * plant_mass / 3.142e-3)
    rdepth = 0.3 * length
    decay = np.exp(np.log(0.1) / (rdepth / 10.0))
    rootr = np.array([decay ** (grid.zi[i] / 10.0)
                      - decay ** (grid.zi[i + 1] / 10.0)
                      for i in range(nl)])
    return ref.ColumnState(
        h2osoi=h2osoi, zwt=(grid.zi[nl] + 5000.0) / 1000.0, wa=4000.0,
        smp=smp, lai=foliage * c.SLA, lai_litter=0.001, rootr=rootr,
        plant_mass=plant_mass, plant_foliage_mass=foliage)


def read_site_climate_csv(path: str) -> List[ref.DailyForcing]:
    """Read daily site climate from CSV.

    Expected columns (header, any order): tas [K], rlds, rsds [W/m^2],
    huss [kg/kg], ps [Pa], pr [kg/m^2/s], rhs [%] — the PGF variable set
    at daily cadence (the modern analog of the reference's positional
    LCLIM CSVs, HYBRID9.f90:368-379).
    """
    days = []
    with open(path) as f:
        for row in csv.DictReader(f):
            days.append(ref.DailyForcing(
                tas=float(row["tas"]), rlds=float(row["rlds"]),
                rsds=float(row["rsds"]), huss=float(row["huss"]),
                ps=float(row["ps"]), pr=float(row["pr"]),
                rhs=float(row["rhs"])))
    return days


def read_site_subdaily_csv(path: str, nisurf: int):
    """Read sub-daily site climate overrides from CSV.

    Columns (header): ``doy``, ``step`` (1..nisurf), and any of ``tak``
    [K], ``rh`` [%], ``rnet`` [W/m^2], ``par`` [W/m^2], ``ppt``
    [mm/substep] — the named-column analog of the reference's positional
    LCLIM sub-daily rows (HYBRID9.f90:426-460).  Returns
    ``{doy: [override-dict per substep]}``; ``ppt`` is converted to a
    rain flux (mm/s).
    """
    dt = c.SDAY / nisurf
    out: Dict[int, list] = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            doy = int(row["doy"])
            step = int(row["step"]) - 1
            if doy not in out:
                out[doy] = [{} for _ in range(nisurf)]
            ov = {}
            for k in ("tak", "rh", "rnet", "par"):
                if row.get(k) not in (None, ""):
                    ov[k] = float(row[k])
            if row.get("ppt") not in (None, ""):
                ov["forc_rain"] = float(row["ppt"]) / dt
            out[doy][step] = ov
    return out


def run_site(cfg: Config,
             climate: Optional[Iterable[ref.DailyForcing]] = None,
             params: Optional[ref.ColumnParams] = None,
             lai_waypoints: Optional[Dict[int, float]] = None,
             subdaily: Optional[Dict[int, list]] = None,
             grow: bool = True,
             csv_out: Optional[str] = None) -> SiteResult:
    """Run the single-column site simulation.

    ``cfg.spinup_years`` repeats of the climate record precede the scored
    years (the reference's iLOOP spin-up, HYBRID9.f90:341).
    ``lai_waypoints`` optionally prescribes LAI on given days-of-year,
    with shed foliage moved to the litter layer exactly as the reference
    does for the Vaira phenology (HYBRID9.f90:380-417).  ``subdaily``
    maps day-of-year to per-substep forcing overrides (see
    :func:`read_site_subdaily_csv`); ``grow=False`` disables the daily
    GROW call (the LCLIM mode with prescribed LAI,
    HYBRID9.f90:473-475).
    """
    grid = cfg.layer_grid()
    nl = grid.nsoil
    if params is None:
        raw = synthetic_soil_params(1, seed=17, n_layers=nl)
        params = ref.ColumnParams(
            theta_s=raw["theta_s"][0], hksat=raw["hksat"][0],
            bsw=raw["bsw"][0], psi_s=raw["psi_s"][0],
            fmax=float(raw["fmax"][0]))
    if climate is None:
        climate = [
            ref.DailyForcing(**{k: float(v[0]) for k, v in
                                synthetic_forcing_day(
                                    1, d + 1, seed=17,
                                    lat=np.array([cfg.site_lat])).items()})
            for d in range(365)]
    climate = list(climate)

    state = _initial_column(params, grid)
    zi, dz, zc = grid.zi, grid.dz, grid.zc
    dt = cfg.dt
    daily: List[Dict[str, float]] = []

    n_loops = max(1, cfg.spinup_years + 1)
    for loop in range(n_loops):
        scored = loop == n_loops - 1
        for d, forcing in enumerate(climate):
            doy = d + 1
            if lai_waypoints and doy in lai_waypoints:
                new_lai = lai_waypoints[doy]
                if new_lai < state.lai:
                    state.lai_litter += state.lai - new_lai
                state.lai = new_lai
            out = ref.run_day(state, params, forcing, zi, dz.copy(),
                              zc.copy(), dt, cfg.nisurf,
                              subdaily=(subdaily or {}).get(doy),
                              grow=grow)
            if scored:
                theta = state.h2osoi[:nl] / dz[:nl]
                daily.append(dict(
                    year=cfg.start_year, doy=doy,
                    evap_day=out["evap_day"],
                    evap_grnd_day=out["evap_grnd_day"],
                    theta1=theta[0], theta2=theta[1], theta3=theta[2],
                    theta4=theta[3], theta_ma1=0.0,
                    lai=state.lai, lai_litter=state.lai_litter,
                    w_i=out["w_i"], f_t=out["f_t"],
                    max_residual=out["max_residual"],
                ))

    if csv_out:
        with open(csv_out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(CSV_HEADER)
            for row in daily:
                w.writerow([row["year"], row["doy"]]
                           + [f"{row[k]:.4f}" for k in CSV_HEADER[2:]])
        log.info("wrote %d daily rows to %s", len(daily), csv_out)

    return SiteResult(daily=daily, state=state)
