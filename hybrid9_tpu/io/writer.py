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
from typing import Dict, Optional

import numpy as np

from ..grids.grid import LandGrid
from ..utils.logging import get_logger
from . import netcdf

log = get_logger(__name__)

ANNUAL_UNITS = {
    "npp": "g[DM] m-2 yr-1",
    "plant_mass": "g[DM] m-2",
    "rnf": "mm s-1",
    "discharge": "mm yr-1",
    "t_surface": "K",
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
    "swe": "mm",
    "soil_ice": "mm",
    "rh": "g[C] m-2 yr-1",
    "nee": "g[C] m-2 yr-1",
    "c_soil": "g[C] m-2",
    "max_abs_residual": "mm",
}


def write_init_diagnostics(output_path: str, land_grid: LandGrid,
                           params, n_shards: int = 1) -> str:
    """Write the init-time diagnostic fields the reference produces.

    The analog of the reference's psi_s.nc (INIT.f90:686-689), soil_tex.nc
    and chunk.nc decomposition map (INIT.f90:823-835): the saturated
    matric potential stack, the land mask, and each cell's owning shard
    index under the 1-D cell decomposition — eyeball-able in any NetCDF
    viewer.
    """
    import numpy as np

    os.makedirs(output_path, exist_ok=True)
    path = os.path.join(output_path, "init_diagnostics.nc")
    n = land_grid.n_padded
    shard = np.floor_divide(np.arange(n), max(1, n // max(1, n_shards)))
    fields = {
        "psi_s": land_grid.scatter(
            np.asarray(params.psi_s, np.float64)),
        "theta_s": land_grid.scatter(
            np.asarray(params.theta_s, np.float64)),
        "fmax": land_grid.scatter(np.asarray(params.fmax, np.float64)),
        "land_mask": land_grid.scatter(
            np.ones(n, np.float64), fill=0.0),
        "shard_map": land_grid.scatter(shard.astype(np.float64)),
    }
    if land_grid.soil_tex is not None:
        # The reference's soil_tex.nc input-mask artifact (INIT.f90:835)
        # — available whenever the soil source carries texture classes.
        fields["soil_tex"] = np.asarray(land_grid.soil_tex, np.float64)
    layer_dim = fields["psi_s"].shape[-1]
    netcdf.write_grid_file(path, fields, land_grid.lon, land_grid.lat,
                           units={"psi_s": "mm"}, layer_dim=layer_dim)
    log.info("wrote init diagnostics to %s", path)
    return path


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


class ShardedAnnualWriter:
    """Per-host shard output for multi-host runs.

    The TPU-native analog of the reference's collective parallel
    NetCDF-4/MPI-IO annual write, where every rank participates in the
    file definition and then puts only its own tile
    (WRITE_NET_CDF_3DR.f90:93-94, 211-257): each process writes its slab
    of the packed cell axis to ``axy<year>.part<i>.nc``, and the primary
    process stitches the parts into the reference-layout global
    ``axy<year>.nc`` once all slabs are on disk (the shared filesystem
    plays the role of MPI-IO).
    """

    def __init__(self, output_path: str, land_grid: LandGrid,
                 cell_start: int, cell_stop: int,
                 process_index: Optional[int] = None,
                 n_processes: Optional[int] = None,
                 stitch: bool = True, stitch_timeout: float = 600.0):
        import jax
        self.output_path = output_path
        self.grid = land_grid
        self.lo = int(cell_start)
        self.hi = int(cell_stop)
        self.pid = (jax.process_index() if process_index is None
                    else process_index)
        self.np_ = (jax.process_count() if n_processes is None
                    else n_processes)
        self.stitch = stitch
        self.stitch_timeout = stitch_timeout
        os.makedirs(output_path, exist_ok=True)
        # Stale-part guard: only parts written during THIS run (mtime
        # after construction) count toward a stitch — leftovers from a
        # crashed or differently-configured earlier run into the same
        # output_path must never be mixed into a fresh global file.
        import time as _time
        self._t0 = _time.time() - 1.0   # 1 s clock slack

    def _part_path(self, year: int, pid: int) -> str:
        return os.path.join(self.output_path, f"axy{year}.part{pid}.nc")

    def write_annual(self, year: int,
                     means: Dict[str, np.ndarray]) -> str:
        """Write this host's [local_n] / [local_n, nl] slab, then stitch.

        ``means`` holds process-local slabs (Simulation hands each host
        only its own cells under multi-host execution).
        """
        from scipy.io import netcdf_file
        path = self._part_path(year, self.pid)
        tmp = path + ".tmp"
        with netcdf_file(tmp, "w") as f:
            f.cell_start = self.lo
            f.cell_stop = self.hi
            f.n_parts = self.np_
            local_n = self.hi - self.lo
            f.createDimension("cell", local_n)
            layer_done = False
            for name, arr in means.items():
                arr = np.asarray(arr, np.float64)
                if arr.shape[0] != local_n:
                    raise ValueError(
                        f"{name}: expected local slab of {local_n} cells, "
                        f"got {arr.shape}")
                if arr.ndim == 2 and not layer_done:
                    f.createDimension("layer", arr.shape[1])
                    layer_done = True
                dims = ("cell",) if arr.ndim == 1 else ("cell", "layer")
                v = f.createVariable(name, "d", dims)
                v[:] = arr
        os.replace(tmp, path)
        log.info("wrote shard part %s (cells [%d, %d))", path, self.lo,
                 self.hi)
        if self.stitch and self.pid == 0:
            return self.stitch_year(year)
        return path

    def stitch_year(self, year: int) -> str:
        """Assemble part files into the global axy<year>.nc (primary).

        Only parts written during this run are accepted (mtime check);
        consumed parts are deleted after a successful stitch so reruns
        into the same directory cannot silently mix simulations.
        """
        import time as _time
        from scipy.io import netcdf_file
        paths = [self._part_path(year, p) for p in range(self.np_)]

        def fresh(p):
            try:
                return os.path.getmtime(p) >= self._t0
            except OSError:
                return False

        deadline = _time.monotonic() + self.stitch_timeout
        while not all(fresh(p) for p in paths):
            if _time.monotonic() > deadline:
                missing = [p for p in paths if not fresh(p)]
                raise TimeoutError(
                    f"stitch axy{year}: missing/stale parts {missing}")
            _time.sleep(0.2)
        packed: Dict[str, np.ndarray] = {}
        for p in paths:
            with netcdf_file(p, "r", mmap=False) as f:
                lo, hi = int(f.cell_start), int(f.cell_stop)
                if int(f.n_parts) != self.np_:
                    raise ValueError(
                        f"{p}: written for {int(f.n_parts)} processes, "
                        f"this run has {self.np_}")
                for name, var in f.variables.items():
                    arr = np.asarray(var[:])
                    if name not in packed:
                        packed[name] = np.empty(
                            (self.grid.n_padded, *arr.shape[1:]),
                            np.float64)
                    packed[name][lo:hi] = arr
        path = os.path.join(self.output_path, f"axy{year}.nc")
        fields = {}
        layer_dim = None
        for name, arr in packed.items():
            fields[name] = self.grid.scatter(arr, fill=np.nan)
            if arr.ndim == 2:
                layer_dim = arr.shape[1]
        netcdf.write_grid_file(path, fields, self.grid.lon, self.grid.lat,
                               units=ANNUAL_UNITS, layer_dim=layer_dim)
        for p in paths:
            try:
                os.remove(p)
            except OSError:
                pass
        log.info("stitched %s from %d parts (%d fields)", path, self.np_,
                 len(fields))
        return path


class FocusCSVWriter:
    """Daily CSV for the INTERACTIVE focus cell.

    The analog of the reference's per-day diagnostic CSV (unit 20,
    HYBRID9.f90:221-229, header written at INIT.f90:887-891) in
    ``focus_daily.csv``; when the day step supplies a per-substep
    water-table trace (the XLA path's ``wt_substeps``), the reference's
    unit-98 trace (HYDROLOGY.f90:509) is written alongside as
    ``focus_wt.csv`` with one row per substep.
    """

    COLUMNS = ("year", "doy", "tas", "pr", "rsds", "evap", "evap_grnd",
               "rnf", "discharge", "npp", "rh", "nee", "zwt", "wa",
               "lai", "plant_mass", "theta_mean", "t_surf", "swe",
               "residual")

    def __init__(self, output_path: str):
        os.makedirs(output_path, exist_ok=True)
        self.path = os.path.join(output_path, "focus_daily.csv")
        self._fh = open(self.path, "w")
        self._fh.write(",".join(self.COLUMNS) + "\n")
        self.wt_path = os.path.join(output_path, "focus_wt.csv")
        self._wt_fh = None

    def append(self, year: int, start_doy: int, rows: Dict) -> None:
        """Append one forcing block of stacked [days] focus diagnostics."""
        rows = {k: np.asarray(v) for k, v in rows.items()}
        wt = rows.pop("wt_substeps", None)      # [days, nisurf] or absent
        ndays = len(next(iter(rows.values())))
        for d in range(ndays):
            vals = [str(year), str(start_doy + d)]
            vals += [f"{float(rows[k][d]):.6g}" for k in self.COLUMNS[2:]]
            self._fh.write(",".join(vals) + "\n")
        self._fh.flush()
        if wt is not None:
            if self._wt_fh is None:
                self._wt_fh = open(self.wt_path, "w")
                self._wt_fh.write("year,doy,step,zwt\n")
            for d in range(ndays):
                for s in range(wt.shape[1]):
                    self._wt_fh.write(f"{year},{start_doy + d},{s + 1},"
                                      f"{float(wt[d, s]):.6g}\n")
            self._wt_fh.flush()

    def close(self) -> None:
        self._fh.close()
        if self._wt_fh is not None:
            self._wt_fh.close()
