"""HYBRID9-TPU: a TPU-native global land-surface water & carbon model.

A from-scratch JAX/XLA re-design of the capabilities of the Fortran+MPI
reference HYBRID9 (Friend, U. Cambridge): CESM/CLM4.5-style multi-layer
soil hydrology with batched tridiagonal Richards solves, Shuttleworth-
Wallace dual-source evapotranspiration, TOPMODEL runoff with an
unconfined-aquifer water table, and daily vegetation carbon dynamics —
vmapped over a packed, HBM-resident array of global land cells and sharded
across TPU meshes with ``jax.sharding``.
"""

__version__ = "0.1.0"

from .config import CANONICAL_ZI_MM, Config, LayerGrid
from .state import (AnnualAccumulators, Forcing, ModelState, SoilParams,
                    SoilState, SubstepFluxes, VegState, initial_state)

__all__ = [
    "CANONICAL_ZI_MM",
    "Config",
    "LayerGrid",
    "AnnualAccumulators",
    "Forcing",
    "ModelState",
    "SoilParams",
    "SoilState",
    "SubstepFluxes",
    "VegState",
    "initial_state",
]
