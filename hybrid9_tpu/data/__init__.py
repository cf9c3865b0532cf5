"""Data ingest: synthetic generators, soil-property and forcing pipelines."""

from .synthetic import (synthetic_forcing_block, synthetic_forcing_day,
                        synthetic_soil_params)

__all__ = [
    "synthetic_forcing_block",
    "synthetic_forcing_day",
    "synthetic_soil_params",
]
