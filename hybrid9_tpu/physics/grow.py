"""Daily vegetation carbon dynamics, vectorized.

TPU-native batched implementation of the reference's GROW kernel
(SOURCE/GROW.f90): a pure function ``(VegState, smp, tas) -> (VegState,
npp)`` mapped over all cells.  The reference's single-plant loop
(nplants_max = 1, SHARED.f90:63) collapses to per-cell arithmetic.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import constants as c
from ..state import VegState


def grow_daily(veg: VegState, smp: jnp.ndarray, tas: jnp.ndarray,
               zi: jnp.ndarray, return_fluxes: bool = False
               ) -> Tuple[VegState, jnp.ndarray]:
    """One day of growth for all cells.

    Args:
      veg: vegetation state (``[n]`` / ``[n, 8]`` arrays).
      smp: ``[n, 8]`` matric potential from the last hydrology substep of
        the day (the cross-kernel carry, GROW.f90:57).
      tas: ``[n]`` daily air temperature (K).
      zi: ``[10]`` static interface depths (mm).
      return_fluxes: also return the growth/loss fluxes per pool
        (needed by the vegetation equilibrium spin-up, spinup.py).

    Returns ``(state, npp, litterfall)``: daily NPP and the realized
    plant-mass loss to litter (both g DM/day, ``[n]``).  With
    ``return_fluxes``, a fourth element: a dict of the day's per-pool
    gains and losses (g DM/day) — growth is mass-independent and every
    loss is proportional to its pool, so the periodic steady state can
    be solved by the same flux-ratio jump as the carbon pools.
    """
    nl = smp.shape[1]
    zi = jnp.asarray(zi, smp.dtype) if not isinstance(zi, jnp.ndarray) \
        else zi

    # Root-weighted soil-moisture constraint: ramp on smp between -150,000
    # and -50,000 mm (CESM Eqn 8.27 analog; GROW.f90:55-62).
    wi_l = (-150000.0 - smp) / (-150000.0 - (-50000.0))
    w_i = jnp.sum(veg.rootr * jnp.clip(wi_l, 0.0, 1.0), axis=-1)

    # Temperature constraint (Hayat et al. 2017 Eqn 19; GROW.f90:66-72).
    # The reference leaves the warm branch unclamped, so daily-mean
    # temperatures above 39 C (d > 18 + 21) yield a NEGATIVE growth rate
    # that can drive plant mass below zero, flip the rooting depth
    # negative and blow up the root-profile exponential (and with it the
    # soil-water solve).  We clamp it at 0 — see DEVIATIONS.md #9.
    d = tas - c.TF
    ft_warm = jnp.maximum(0.0, 1.0 - (jnp.abs(d - 18.0) / 21.0) ** 2)
    ft_cool = jnp.clip(1.0 - (jnp.abs(d - 18.0) / 25.0) ** 2, 0.0, 1.0)
    f_t = jnp.where(d > 18.0, ft_warm, ft_cool)

    # Growth and losses (GROW.f90:90-146).
    grow_pm = (1000.0 / 365.0) * w_i * f_t
    grow_fm = grow_pm / 3.3
    loss_pm = (0.1 / 365.0) * veg.plant_mass
    loss_fm = (1.0 / 365.0) * veg.plant_foliage_mass \
        / jnp.clip(w_i, 0.01, 1.0)
    loss_fm = jnp.where(w_i < 0.6, 0.1 * veg.plant_foliage_mass, loss_fm)
    dpm = grow_pm - loss_pm
    dfm = grow_fm - loss_fm
    # Seed-bank floors: pools cannot go non-positive (maintenance and
    # turnover are proportional losses in the reference, but the f_t=0
    # clamp above plus discrete days could still overshoot at tiny mass;
    # DEVIATIONS.md #9).
    plant_mass = jnp.maximum(1.0e-3, veg.plant_mass + dpm)
    plant_foliage_mass = jnp.maximum(1.0e-5,
                                     veg.plant_foliage_mass + dfm)

    # Cylinder allometry (GROW.f90:155-156); cbrt for robustness at
    # non-positive mass (DEVIATIONS.md).
    plant_length = jnp.cbrt(400.0 * plant_mass / 3.142e-3)
    dlai = dfm * c.SLA
    lai = jnp.maximum(0.001, veg.lai + dlai)
    lai_litter = veg.lai_litter + jnp.maximum(0.0, dlai)
    rdepth = 0.3 * plant_length

    # Root profile: 90 % of roots within rdepth (Baldocchi;
    # GROW.f90:176-182).  rdepth > 0 is guaranteed by the mass floor; the
    # extra 1 mm floor makes divergence (decay > 1) structurally
    # impossible.
    decay = jnp.exp(jnp.log(0.1) / (jnp.maximum(rdepth, 1.0) / 10.0))
    rootr = (decay[:, None] ** (zi[None, :nl] / 10.0)
             - decay[:, None] ** (zi[None, 1:nl + 1] / 10.0))

    npp = dpm

    # Litter decay, 2 %/day (GROW.f90:201).
    lai_litter = lai_litter - 0.02 * lai_litter

    new_veg = veg.replace(
        plant_mass=plant_mass,
        plant_foliage_mass=plant_foliage_mass,
        plant_length=plant_length,
        rdepth=rdepth,
        lai=lai,
        lai_litter=lai_litter,
        rootr=rootr,
    )
    # Litterfall: the mass the plant pools actually lost today
    # (maintenance + foliage turnover/drought shed, GROW.f90:120-146),
    # g DM/day, computed from the realized pool updates so the
    # seed-bank floors cannot make litter exceed the mass that left the
    # plant.  The reference drops these losses on the floor; the carbon
    # subsystem (physics/carbon.py) routes them into the litter pool.
    litterfall = (jnp.maximum(0.0, veg.plant_mass + grow_pm - plant_mass)
                  + jnp.maximum(0.0, veg.plant_foliage_mass + grow_fm
                                - plant_foliage_mass))
    if return_fluxes:
        # Realized production: carbon that actually entered the plant
        # pools today.  By construction Δ(mass + foliage) = production -
        # litterfall exactly (floors included), so an NEE built on it is
        # conservative — unlike the reference's npp = dpm (net-of-
        # maintenance mass change, GROW.f90:186), which omits foliage
        # growth entirely and cannot balance rh at equilibrium.
        production = ((plant_mass - veg.plant_mass)
                      + (plant_foliage_mass - veg.plant_foliage_mass)
                      + litterfall)
        fluxes = dict(v_grow_pm=grow_pm, v_loss_pm=loss_pm,
                      v_grow_fm=grow_fm, v_loss_fm=loss_fm,
                      v_production=production)
        return new_veg, npp, litterfall, fluxes
    return new_veg, npp, litterfall
