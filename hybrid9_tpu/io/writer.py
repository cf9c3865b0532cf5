"""Annual diagnostics writer: the axy<year> output files.

TPU-native equivalent of WRITE_NET_CDF_3DR (SOURCE/WRITE_NET_CDF_3DR.f90):
writes the same 11-variable annual-mean file (npp, plant_mass, rnf, evap,
tas, huss, ps, pr, rhs, theta_total, per-layer theta; names and units from
WRITE_NET_CDF_3DR.f90:50-81) plus the water-balance residual diagnostic.
Packed ``[n]`` diagnostics are scattered back to the (lat, lon) grid with
fill values over ocean (the reference's NaN fills,
WRITE_NET_CDF_3DR.f90:186-197), then written single-writer NetCDF-3.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..grids.grid import LandGrid
from ..utils.logging import get_logger
from . import netcdf

log = get_logger(__name__)

ANNUAL_UNITS = {
    "npp": "g[DM] m-2 yr-1",
    "plant_mass": "g[DM] m-2",
    "rnf": "mm s-1",
    "evap": "mm s-1",
    "tas": "K",
    "huss": "kg kg-1",
    "ps": "Pa",
    "pr": "kg m-2 s-1",
    "rhs": "%",
    "rlds": "W m-2",
    "rsds": "W m-2",
    "theta_total": "mm",
    "theta": "m3 m-3",
    "max_abs_residual": "mm",
}


class AnnualWriter:
    """Writes axy<year>.nc files from packed annual-mean diagnostics."""

    def __init__(self, output_path: str, land_grid: LandGrid):
        self.output_path = output_path
        self.grid = land_grid
        os.makedirs(output_path, exist_ok=True)

    def write_annual(self, year: int,
                     means: Dict[str, np.ndarray]) -> str:
        path = os.path.join(self.output_path, f"axy{year}.nc")
        fields = {}
        layer_dim = None
        for name, packed in means.items():
            arr = np.asarray(packed, dtype=np.float64)
            scattered = self.grid.scatter(arr, fill=np.nan)
            fields[name] = scattered
            if arr.ndim == 2:
                layer_dim = arr.shape[1]
        netcdf.write_grid_file(path, fields, self.grid.lon, self.grid.lat,
                               units=ANNUAL_UNITS, layer_dim=layer_dim)
        log.info("wrote %s (%d fields)", path, len(fields))
        return path
