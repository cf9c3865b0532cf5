"""Forcing pipeline: block providers with background prefetch.

TPU-native replacement for READ_PGF's decade-at-a-time forcing ingest
(SOURCE/READ_PGF.f90; called from HYBRID9.f90:97): forcing is streamed to
the device in bounded blocks ([days, n] per block) with the next block
fetched on a background thread while the device integrates the current
one.  The reference's own notebook identified I/O as the dominant cost
(notes.txt:44-56), so the prefetch pipeline is core infrastructure here,
not glue.

Under multi-host execution each host reads only its own shard of the cell
axis (same ownership pattern as each MPI rank's tile hyperslab,
READ_NET_CDF_3DR.f90:95-97).
"""

from __future__ import annotations

import concurrent.futures
import threading
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..state import Forcing
from .synthetic import synthetic_forcing_block

# PGF v2.1 variable set (READ_PGF.f90:22-109).
PGF_VARIABLES = ("tas", "rlds", "rsds", "huss", "ps", "pr", "rhs")


def pgf_decade_path(base_dir: str, var: str, year: int) -> str:
    """Path of the PGF v2.1 decade file holding ``year`` for ``var``.

    Reproduces the reference's naming convention
    ``<var>_pgfv2.1_<syr>_<eyr>.nc4`` (READ_PGF.f90:22-109; decade table
    CONTROL.f90:174-177), e.g. ``tas_pgfv2.1_1901_1910.nc4``.
    """
    from .. import calendar
    syr, eyr = calendar.decade_year_span(calendar.decade_of_year(year))
    return f"{base_dir}/{var}_pgfv2.1_{syr}_{eyr}.nc4"


class SyntheticForcingProvider:
    """Deterministic synthetic forcing keyed by (year, day-of-year).

    ``cell_slice`` narrows the returned block to this host's cells
    (multi-host: the block is generated deterministically for the global
    axis, then sliced, so every host agrees on cell values).
    """

    def __init__(self, n: int, seed: int = 0,
                 lat: Optional[np.ndarray] = None, dtype=jnp.float32,
                 cell_slice: Optional[slice] = None):
        self.n = n
        self.seed = seed
        self.lat = lat
        self.dtype = dtype
        self.cell_slice = cell_slice or slice(None)

    def __call__(self, year: int, start_doy: int, n_days: int) -> Forcing:
        block = synthetic_forcing_block(
            n_days, self.n, seed=self.seed + year, start_doy=start_doy,
            lat=self.lat)
        return Forcing(**{k: jnp.asarray(v[:, self.cell_slice],
                                         self.dtype)
                          for k, v in block.items()})


# Benign per-variable fill for padding lanes a host cannot source from a
# local real cell (zero-fill means tas = 0 K, which blows up the ET
# psychrometrics; padding state is discarded, but non-finite lanes poison
# global max-reductions and the health check).
_PAD_FORCING = {"tas": 280.0, "rlds": 300.0, "rsds": 100.0,
                "huss": 0.005, "ps": 1.0e5, "pr": 0.0, "rhs": 50.0}


class NetCDFForcingProvider:
    """Reads PGF-style NetCDF archives, one block of days at a time.

    File layout follows the PGF convention: one file per variable per
    decade named ``<var>_<tag>.nc[4]`` holding ``[time, lat, lon]``
    (READ_PGF.f90:22-109); cells are gathered to the packed land axis via
    the provided LandGrid.

    ``cell_range=(lo, hi)`` restricts the provider to a slab of the
    packed cell axis AND narrows every file read to the latitude-row band
    that slab occupies — each host hyperslabs only its own spatial
    footprint, exactly the reference's per-rank tile read
    (READ_NET_CDF_3DR.f90:95-97: start (lon_s, lat_s, 1), count
    (lon_c, lat_c, NTIMES)).  ``cell_slice`` is the legacy full-read +
    post-slice path, kept for callers that already hold global bricks.
    """

    def __init__(self, path_pattern: str, land_grid, dtype=jnp.float32,
                 cell_slice: Optional[slice] = None,
                 cell_range: Optional[tuple] = None):
        from ..io import netcdf as nc
        self._nc = nc
        self.path_pattern = path_pattern
        self.grid = land_grid
        self.dtype = dtype
        self.cell_slice = cell_slice or slice(None)
        self.cell_range = cell_range
        if cell_range is not None:
            lo, hi = cell_range
            self.row_lo, self.row_hi, self._local_idx = \
                land_grid.row_band(lo, hi)
            self.n_slab = hi - lo
            self.n_real = self._local_idx.shape[0]

    def _path(self, var: str, year: int) -> str:
        if "{var}" in self.path_pattern:
            return self.path_pattern.format(var=var, year=year)
        return pgf_decade_path(self.path_pattern, var, year)

    def __call__(self, year: int, start_doy: int, n_days: int) -> Forcing:
        from .. import calendar
        t0 = calendar.time_boy(year) - calendar.time_boy(
            1901 + ((year - 1901) // 10) * 10) + start_doy - 1
        tslice = slice(t0, t0 + n_days)
        arrays: Dict[str, jnp.ndarray] = {}
        from ..io import native
        for var in PGF_VARIABLES:
            path = self._path(var, year)
            if self.cell_range is not None:
                # Per-host narrowed read: only this slab's lat-row band.
                if self.n_real:
                    raw = self._nc.read_variable(
                        path, var,
                        (tslice, slice(self.row_lo, self.row_hi)))
                    packed = native.pack_forcing_block(
                        np.asarray(raw), self._local_idx, self.n_slab)
                    packed[:, self.n_real:] = packed[:, :1]
                else:  # slab is entirely padding lanes
                    packed = np.full((n_days, self.n_slab),
                                     _PAD_FORCING[var], np.float32)
                arrays[var] = jnp.asarray(packed, self.dtype)
                continue
            raw = self._nc.read_variable(path, var, (tslice,))
            # One-pass gather + narrowing through the native library
            # (h9_pack_forcing_block) when built.
            packed = native.pack_forcing_block(
                np.asarray(raw), self.grid.land_idx, self.grid.n_padded)
            packed[:, self.grid.n_land:] = packed[:, :1]
            arrays[var] = jnp.asarray(packed[:, self.cell_slice],
                                      self.dtype)
        return Forcing(**arrays)


class HostShardedProvider:
    """Per-host sharded ingest: assembles global forcing blocks from
    process-local reads.

    Wraps a provider configured to read only this host's ``cell_slice``
    of the packed axis and assembles the global ``[days, n]`` arrays with
    ``jax.make_array_from_process_local_data`` — the multi-host analog of
    each MPI rank hyperslab-reading its own tile
    (READ_NET_CDF_3DR.f90:95-97).  No host ever materialises the global
    forcing block.
    """

    def __init__(self, local_provider: Callable[[int, int, int], Forcing],
                 sharding, n_global: int):
        self.provider = local_provider
        self.sharding = sharding
        self.n_global = n_global

    def __call__(self, year: int, start_doy: int, n_days: int) -> Forcing:
        import jax
        local = self.provider(year, start_doy, n_days)

        def assemble(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                self.sharding.block_spec(x), x,
                (x.shape[0], self.n_global, *x.shape[2:]))

        return jax.tree_util.tree_map(assemble, local)


class PrefetchingProvider:
    """Wraps a provider with single-slot background prefetch.

    ``prefetch(year, doy, n)`` schedules the read; the next matching call
    returns the ready block without blocking the host loop — the
    double-buffering the reference approximated by reading whole decades
    up front (HYBRID9.f90:93-97).
    """

    def __init__(self, provider: Callable[[int, int, int], Forcing]):
        self.provider = provider
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._lock = threading.Lock()
        self._pending: Dict[tuple, concurrent.futures.Future] = {}

    def prefetch(self, year: int, start_doy: int, n_days: int) -> None:
        key = (year, start_doy, n_days)
        with self._lock:
            if key not in self._pending:
                self._pending[key] = self._pool.submit(
                    self.provider, year, start_doy, n_days)

    def __call__(self, year: int, start_doy: int, n_days: int) -> Forcing:
        key = (year, start_doy, n_days)
        with self._lock:
            fut = self._pending.pop(key, None)
        if fut is not None:
            return fut.result()
        return self.provider(year, start_doy, n_days)

    def close(self) -> None:
        self._pool.shutdown(wait=False)
