"""Snowpack: daily rain/snow partition and degree-day melt.

NEW capability beyond the reference: HYBRID9 treats all precipitation as
rain (``forc_rain`` straight from PGF ``pr``, HYBRID9.f90:178-182), so
cold-region cells see winter precipitation infiltrate immediately instead
of accumulating as snow and releasing at melt.  This module adds the
minimal prognostic snowpack used by large-scale hydrology models:

  - precipitation partitions linearly between snow and rain across an air
    temperature ramp ``[TF - 1, TF + 3]`` K (the classic +1 C midpoint);
  - the pack melts at a degree-day rate ``ddf * (tas - TF)`` (default
    3 mm w.e. per K per day, the mid-range of published degree-day
    factors for forest/open sites);
  - melt + rain feed the hydrology substeps as effective rainfall, so
    the soil physics is untouched — the snowpack simply reshapes the
    timing of the water input.

Daily water balance is exact by construction:
``swe' - swe = snowfall - melt`` and ``rain_eff = pr_day - snowfall +
melt``, so ``rain_eff + (swe' - swe) = pr_day``.

Runs at daily cadence on ``[n]`` fields outside the substep kernel
(like routing), costing two selects and a clip per cell-day.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import constants as c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SnowParams:
    """Static snow-scheme parameters (all metadata — no array fields)."""

    ddf: float = dataclasses.field(default=3.0,    # mm w.e. / K / day
                                   metadata=dict(static=True))
    t_rain: float = dataclasses.field(default=c.TF + 3.0,  # all rain >= (K)
                                      metadata=dict(static=True))
    t_snow: float = dataclasses.field(default=c.TF - 1.0,  # all snow <= (K)
                                      metadata=dict(static=True))
    swe_cap: float = dataclasses.field(default=1000.0,     # max pack (mm)
                                       metadata=dict(static=True))


def snow_step(swe: jnp.ndarray, tas: jnp.ndarray, pr: jnp.ndarray,
              p: SnowParams
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                         jnp.ndarray]:
    """One daily snowpack update.

    Args:
      swe: ``[n]`` snow water equivalent (mm).
      tas: ``[n]`` daily air temperature (K).
      pr: ``[n]`` precipitation flux (kg/m^2/s, the PGF field).

    Returns ``(swe_new, pr_eff, melt_mm, capped_mm)``: ``pr_eff`` is the
    effective rainfall flux for the hydrology (same units as ``pr``),
    ``melt_mm`` the day's melt, and ``capped_mm`` the CLM-style snow
    capping overflow — packs cannot exceed ``swe_cap`` (default 1000 mm
    w.e., the CLM cap), and the excess leaves as ice runoff straight to
    the river network, which is how perennially-frozen cells (glacier
    analogs) discharge instead of banking snow without bound (a 112-yr
    uncapped run accumulated ~24 m mean SWE).  Conservation:
    swe' - swe + rain_eff + capped = pr.
    """
    pr_mm_day = pr * c.SDAY            # kg/m^2/s == mm/s -> mm/day
    frac_snow = jnp.clip((p.t_rain - tas) / (p.t_rain - p.t_snow),
                         0.0, 1.0)
    snowfall = pr_mm_day * frac_snow
    melt_pot = p.ddf * jnp.maximum(tas - c.TF, 0.0)
    melt = jnp.minimum(swe + snowfall, melt_pot)
    swe_new = swe + snowfall - melt
    capped = jnp.maximum(swe_new - p.swe_cap, 0.0)
    swe_new = swe_new - capped
    pr_eff = (pr_mm_day - snowfall + melt) / c.SDAY
    return swe_new, pr_eff, melt, capped
