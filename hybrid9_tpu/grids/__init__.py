"""Grids: global lon/lat geometry, land mask, packed-cell gather/scatter."""

from .grid import (LandGrid, cell_centres, make_land_grid,
                   synthetic_land_mask)

__all__ = ["LandGrid", "cell_centres", "make_land_grid",
           "synthetic_land_mask"]
