"""Soil carbon: litter + two SOM pools, decomposition, respiration, NEE.

NEW subsystem beyond the reference.  HYBRID9 is titled a water & CARBON
model, but its carbon cycle stops at the plant: daily NPP updates a
plant-mass pool, plant losses vanish, the labile C/N/P pools are dead
code (SURVEY.md C15; GROW.f90:104-114 never writes them), and there is
no soil carbon, no decomposition, no heterotrophic respiration, no NEE.
This module closes the loop with the standard intermediate-complexity
(CENTURY-family) cascade, at daily cadence on ``[n]`` cell arrays:

    litterfall (g C) -> litter pool -> { respired CO2
                                       , fast SOM } -> { respired CO2
                                                       , slow SOM } -> CO2

- Base turnover rates at the 25 C / moist reference point: litter
  1 yr, fast SOM 10 yr, slow SOM 100 yr.
- A Q10 = 2 temperature modifier on the root-zone soil temperature
  (physics/soiltemp.py supplies the prognostic column) and a
  soil-moisture modifier ramping 0 -> 1 over wetness 0.05 -> 0.6 of
  saturation then easing to 0.6 at saturation (anoxia).
- CENTURY-style transfer: of each pool's decomposed flux, a respired
  fraction leaves as CO2 and the rest cascades to the next pool
  (litter: 55 % respired, 35 % -> fast, 10 % -> slow; fast: 55 %
  respired, 45 % -> slow; slow: 100 % respired).
- Carbon stoichiometry 0.47 g C / g DM, the reference's own constant
  (GROW.f90:104).

Exactly conservative by construction: d(litter + fast + slow) =
litterfall_C - rh.  NEE = rh - npp_C (negative = land sink).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import constants as c

C_PER_DM = 0.47              # g C per g DM (GROW.f90:104)
K_LITTER = 1.0 / 365.0       # /day at reference conditions
K_FAST = 1.0 / (10.0 * 365.0)
K_SLOW = 1.0 / (100.0 * 365.0)
RESP_LITTER = 0.55           # respired fraction of decomposed litter
TO_FAST = 0.35               # litter -> fast SOM fraction
TO_SLOW = 0.10               # litter -> slow SOM fraction
RESP_FAST = 0.55             # respired fraction of decomposed fast SOM
Q10 = 2.0
T_REF = 25.0                 # C


def decomposition_modifiers(t_soil: jnp.ndarray, theta: jnp.ndarray,
                            theta_s: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(f_T, f_W) decomposition rate modifiers, each ``[n]``.

    ``t_soil`` is the ``[n, nl]`` soil-temperature column; the top four
    layers (the root/litter zone, ~0.3 m) are averaged.  ``theta`` and
    ``theta_s`` give wetness; the moisture response rises linearly from
    0.05 to an optimum at 0.6 of saturation, then falls to 0.6 at full
    saturation (anoxic suppression) — the common CENTURY/DAYCENT shape.
    """
    t_c = jnp.mean(t_soil[:, :4], axis=1) - c.TF
    f_t = Q10 ** ((t_c - T_REF) / 10.0)
    wet = jnp.clip(jnp.mean(theta[:, :4], axis=1)
                   / jnp.maximum(jnp.mean(theta_s[:, :4], axis=1), 0.05),
                   0.0, 1.0)
    rise = jnp.clip((wet - 0.05) / (0.60 - 0.05), 0.0, 1.0)
    fall = 1.0 - 0.4 * jnp.clip((wet - 0.60) / 0.40, 0.0, 1.0)
    f_w = rise * fall
    return f_t, f_w


def carbon_daily(carbon, production_dm: jnp.ndarray,
                 litterfall_dm: jnp.ndarray,
                 t_soil: jnp.ndarray, theta: jnp.ndarray,
                 theta_s: jnp.ndarray, return_fluxes: bool = False):
    """One day of the soil-carbon cascade.

    Args:
      carbon: ``state.CarbonState`` (g C/m^2 pools).
      production_dm, litterfall_dm: the day's realized plant production
        and litterfall (g DM/day, from grow_daily's flux record).
        Production must be the REALIZED carbon input to the plant pools
        (grow_daily's ``v_production``: Δpools + litterfall), not the
        reference's npp = net mass change — with realized production,
        NEE = rh - production_C is exactly -d(total ecosystem C)/dt and
        converges to ~0 at equilibrium; with npp it converges to
        +litterfall_C (foliage growth is unaccounted).  See
        DEVIATIONS.md.
      t_soil: ``[n, nl]`` soil temperature (K).
      theta, theta_s: ``[n, nl]`` volumetric water / porosity.
      return_fluxes: also return the internal decomposition fluxes
        (needed by the semi-analytic equilibrium spin-up, spinup.py).

    Returns ``(carbon', rh, nee)`` with heterotrophic respiration and
    net ecosystem exchange in g C/m^2/day (NEE = rh - production_C;
    negative = carbon sink).  With ``return_fluxes``, a fourth element: a dict of
    the day's litter C input and the decomposed flux out of each pool
    (all g C/m^2/day) — the per-pool turnover record from which the
    steady state can be solved pool-by-pool (fluxes are linear in the
    pools for a given modifier series).
    """
    f_t, f_w = decomposition_modifiers(t_soil, theta, theta_s)
    mod = f_t * f_w

    lit_in = C_PER_DM * jnp.maximum(litterfall_dm, 0.0)
    d_lit = carbon.c_litter * jnp.minimum(K_LITTER * mod, 1.0)
    d_fast = carbon.c_soil_fast * jnp.minimum(K_FAST * mod, 1.0)
    d_slow = carbon.c_soil_slow * jnp.minimum(K_SLOW * mod, 1.0)

    c_litter = carbon.c_litter + lit_in - d_lit
    c_fast = carbon.c_soil_fast + TO_FAST * d_lit - d_fast
    c_slow = (carbon.c_soil_slow + TO_SLOW * d_lit
              + (1.0 - RESP_FAST) * d_fast - d_slow)

    rh = RESP_LITTER * d_lit + RESP_FAST * d_fast + d_slow
    nee = rh - C_PER_DM * production_dm
    new = carbon.replace(c_litter=c_litter, c_soil_fast=c_fast,
                         c_soil_slow=c_slow)
    if return_fluxes:
        fluxes = dict(c_lit_in=lit_in, c_d_lit=d_lit, c_d_fast=d_fast,
                      c_d_slow=d_slow)
        return new, rh, nee, fluxes
    return new, rh, nee
