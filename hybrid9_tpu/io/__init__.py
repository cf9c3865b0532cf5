"""I/O: NetCDF read/write, annual diagnostics writer, checkpointing."""

from . import netcdf
from .writer import AnnualWriter

__all__ = ["netcdf", "AnnualWriter"]
