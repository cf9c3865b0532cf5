"""Physics kernels: hydrology substep, vegetation growth, column oracle."""

from . import constants
from .et import dual_source_et
from .grow import grow_daily
from .hydrology import Geometry, derive_forcing, hydrology_substep
from .soilwater import soil_water_update, water_table_index
from .drainage import drainage

__all__ = [
    "constants",
    "dual_source_et",
    "grow_daily",
    "Geometry",
    "derive_forcing",
    "hydrology_substep",
    "soil_water_update",
    "water_table_index",
    "drainage",
]
