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

Two schemes (Config.snow_scheme):

- ``"degree-day"`` (:func:`snow_step`): single SWE store, immediate
  degree-day melt — the minimal scheme described above.
- ``"twolayer"`` (:func:`snow_step_two_layer`): surface + base layers
  with prognostic temperatures (cold content), liquid retention and
  refreeze — melt is delayed until the pack ripens and rain-on-snow can
  refreeze, the behaviors the single-store scheme misses (SNOW-17/HBV
  -family intermediate complexity).
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoLayerSnowParams:
    """Static parameters of the two-layer cold-content snowpack."""

    ddf: float = dataclasses.field(default=3.0,    # mm w.e. / K / day
                                   metadata=dict(static=True))
    t_rain: float = dataclasses.field(default=c.TF + 3.0,
                                      metadata=dict(static=True))
    t_snow: float = dataclasses.field(default=c.TF - 1.0,
                                      metadata=dict(static=True))
    swe_cap: float = dataclasses.field(default=1000.0,
                                       metadata=dict(static=True))
    surf_max: float = dataclasses.field(default=100.0,  # surface SWE (mm)
                                        metadata=dict(static=True))
    hold_frac: float = dataclasses.field(default=0.05,  # liquid capacity
                                         metadata=dict(static=True))
    k_surf: float = dataclasses.field(default=0.5,   # T_surf->tas (/day)
                                      metadata=dict(static=True))
    k_base: float = dataclasses.field(default=0.05,  # T_base->T_surf (/d)
                                      metadata=dict(static=True))
    # Cold content per mm SWE per K below freezing, in mm of refreeze
    # equivalent: c_ice / L_f = 2100 / 334000 (J/kg/K over J/kg).
    cc_per_k: float = dataclasses.field(default=2100.0 / 334000.0,
                                        metadata=dict(static=True))
    t_floor: float = dataclasses.field(default=c.TF - 60.0,  # clamp (K)
                                       metadata=dict(static=True))


def snow_step_two_layer(pack, tas: jnp.ndarray, pr: jnp.ndarray,
                        p: TwoLayerSnowParams):
    """One daily update of the two-layer cold-content snowpack.

    Processes, in order: snowfall into the surface layer (at the air
    temperature, capped at freezing); surface-layer overflow into the
    base layer (mass-weighted temperatures); daily thermal relaxation
    (surface toward the air, base toward the surface); degree-day energy
    first cancels the pack's cold content (ripening), the remainder
    melts ice top-down; rain-on-snow + melt enter the liquid store,
    refreeze against the remaining cold content (releasing latent heat),
    and drain beyond the holding capacity; CLM-style pack capping.

    Args: ``pack`` a state.SnowpackState; ``tas`` [n] daily air
    temperature (K); ``pr`` [n] precipitation flux (kg/m^2/s).

    Returns ``(pack', pr_eff, melt_mm, capped_mm)`` with ``pr_eff`` the
    effective rainfall flux for the hydrology.  Conservation (tested):
    ``d(ice + liquid) + outflow + capped = pr_mm``.
    """
    tf = c.TF
    eps = 1.0e-8
    pr_mm = pr * c.SDAY
    frac_snow = jnp.clip((p.t_rain - tas) / (p.t_rain - p.t_snow),
                         0.0, 1.0)
    snowfall = pr_mm * frac_snow
    rain = pr_mm - snowfall

    m_s, m_b = pack.swe_surf, pack.swe_base
    t_s = jnp.clip(pack.t_surf, p.t_floor, tf)
    t_b = jnp.clip(pack.t_base, p.t_floor, tf)

    # 1. New snow lands in the surface layer at min(tas, TF).
    t_new = jnp.minimum(tas, tf)
    t_s = jnp.where(m_s + snowfall > eps,
                    (t_s * m_s + t_new * snowfall)
                    / jnp.maximum(m_s + snowfall, eps), tf)
    m_s = m_s + snowfall

    # 2. Surface overflow pushes (with its temperature) into the base.
    over = jnp.maximum(m_s - p.surf_max, 0.0)
    t_b = jnp.where(m_b + over > eps,
                    (t_b * m_b + t_s * over)
                    / jnp.maximum(m_b + over, eps), tf)
    m_b = m_b + over
    m_s = m_s - over

    # 3. Daily thermal relaxation, bounded by freezing.
    t_s = jnp.minimum(tf, t_s + p.k_surf * (tas - t_s))
    t_b = jnp.minimum(tf, t_b + p.k_base * (t_s - t_b))
    t_s = jnp.clip(t_s, p.t_floor, tf)
    t_b = jnp.clip(t_b, p.t_floor, tf)

    # 4. Cold content in mm-of-refreeze equivalent.
    cc_s = p.cc_per_k * (tf - t_s) * m_s
    cc_b = p.cc_per_k * (tf - t_b) * m_b

    # 5. Degree-day energy: warm the pack first (ripening), then melt
    #    top-down.
    energy = p.ddf * jnp.maximum(tas - tf, 0.0)
    warm_s = jnp.minimum(energy, cc_s)
    energy = energy - warm_s
    cc_s = cc_s - warm_s
    warm_b = jnp.minimum(energy, cc_b)
    energy = energy - warm_b
    cc_b = cc_b - warm_b
    melt_s = jnp.minimum(m_s, energy)
    energy = energy - melt_s
    melt_b = jnp.minimum(m_b, energy)
    m_s = m_s - melt_s
    m_b = m_b - melt_b
    melt = melt_s + melt_b

    # 6. Liquid store: rain-on-snow + melt; refreeze against remaining
    #    cold content (latent heat consumes it), retention up to
    #    hold_frac of the ice mass, rest drains.
    w = pack.w_liq + rain + melt
    rf_s = jnp.minimum(w, cc_s)
    w = w - rf_s
    rf_b = jnp.minimum(w, cc_b)
    w = w - rf_b
    m_s = m_s + rf_s
    m_b = m_b + rf_b
    cc_s = cc_s - rf_s
    cc_b = cc_b - rf_b
    ice = m_s + m_b
    cap_liq = p.hold_frac * ice
    outflow = jnp.maximum(w - cap_liq, 0.0)
    w = w - outflow
    # A vanished pack cannot hold liquid.
    outflow = jnp.where(ice > eps, outflow, outflow + w)
    w = jnp.where(ice > eps, w, 0.0)

    # 7. CLM-style capping: excess leaves as ice runoff, base first.
    #    The cap bounds the TOTAL pack (ice + retained liquid), matching
    #    the single-store scheme's invariant — a pack at the cap sheds
    #    its liquid as outflow (r4: a 10-yr soak caught the retained
    #    liquid riding hold_frac*cap above the cap).
    capped = jnp.maximum(ice - p.swe_cap, 0.0)
    rm_b = jnp.minimum(m_b, capped)
    m_b = m_b - rm_b
    m_s = m_s - (capped - rm_b)
    liq_over = jnp.maximum(m_s + m_b + w - p.swe_cap, 0.0)
    liq_over = jnp.minimum(liq_over, w)
    outflow = outflow + liq_over
    w = w - liq_over

    # 8. Recover layer temperatures from the surviving cold content.
    t_s = jnp.where(m_s > eps,
                    tf - cc_s / (p.cc_per_k * jnp.maximum(m_s, eps)), tf)
    t_b = jnp.where(m_b > eps,
                    tf - cc_b / (p.cc_per_k * jnp.maximum(m_b, eps)), tf)
    t_s = jnp.clip(t_s, p.t_floor, tf)
    t_b = jnp.clip(t_b, p.t_floor, tf)

    new_pack = pack.replace(swe_surf=m_s, swe_base=m_b, w_liq=w,
                            t_surf=t_s, t_base=t_b)
    pr_eff = outflow / c.SDAY          # capped overflow goes to rivers
    return new_pack, pr_eff, melt, capped
