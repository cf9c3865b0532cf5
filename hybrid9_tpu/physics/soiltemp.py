"""Prognostic soil-temperature column (surface energy balance closure).

Extension beyond the reference: HYBRID9 computes the surface energy
partitioning (SW85 net radiation, latent heat, ground heat flux
G = 0.2 * Rnets, HYDROLOGY.f90:335-339) but discards G — there is no
prognostic temperature ("Note yet implemented: energy balance",
HYBRID9.f90:24).  This module closes that loop with a CLM-style implicit
heat-diffusion column on the same soil layers, driven by the daily-mean
ground heat flux and solved with the same batched Thomas machinery as
the water column:

    c_v(theta) dT/dt = d/dz ( k(theta) dT/dz ),   F_top = G,  F_bot = 0

Thermal properties blend dry soil and water with moisture (de
Vries-style): k = k_dry + (k_sat - k_dry) * Se, c_v = c_solid * (1 -
theta_s) + c_water * theta.  Freeze/thaw latent heat enters by the
apparent-heat-capacity method over a band below TF (``latent_ramp``),
giving the zero-curtain hold near 0 C.  One implicit solve per model
day (G is constant within a day because forcing is daily), so the cost
is negligible next to the 48 hydrology substeps.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from .layers import stack, unstack
from .soilwater import _thomas_solve

K_DRY = 0.30       # Dry soil thermal conductivity            (W/m/K)
K_SAT = 1.80       # Saturated soil thermal conductivity      (W/m/K)
C_SOLID = 2.0e6    # Volumetric heat capacity of soil solids  (J/m^3/K)
C_WATER = 4.18e6   # Volumetric heat capacity of water        (J/m^3/K)
C_ICE = 1.9e6      # Volumetric heat capacity of ice          (J/m^3/K)
WATMIN = 0.01      # Liquid floor never frozen (mm; reference watmin,
                   # HYDROLOGY.f90:1156)


def soil_temperature_step(t_soil: jnp.ndarray, theta: jnp.ndarray,
                          theta_s: jnp.ndarray, g_flux: jnp.ndarray,
                          dz_mm, zc_mm, dt: float,
                          t_air: jnp.ndarray = None,
                          h_surf: jnp.ndarray = 0.0,
                          latent_ramp: float = 0.0) -> jnp.ndarray:
    """One implicit heat-diffusion step.

    Args:
      t_soil: ``[n, nl]`` layer temperatures (K).
      theta: ``[n, nl]`` volumetric soil water (-).
      theta_s: ``[n, nl]`` porosity (-).
      g_flux: ``[n]`` ground heat flux into the surface (W/m^2,
        positive downward).
      dz_mm, zc_mm: static layer geometry (mm, tuples).
      dt: step length (s), normally one day.
      t_air: ``[n]`` air temperature (K); with ``h_surf`` > 0 the top
        layer exchanges sensible heat ``h_surf * (t_air - T_1)``
        (treated implicitly), anchoring the column to the atmosphere —
        without it, a standalone G-forced column drifts unboundedly
        because nothing closes the surface energy balance.
      h_surf: ``[n]`` or scalar surface exchange conductance (W/m^2/K).
      latent_ramp: if > 0 (K), freeze/thaw latent heat by the apparent
        heat-capacity method: layers whose step intersects the freezing
        band ``(TF - latent_ramp, TF)`` absorb the fusion enthalpy of
        their water, ``rho_w * L_f * theta``, spread over the band — so
        the column lingers near 0 C while its water changes phase (the
        observed "zero curtain") instead of snapping through.  A
        predictor pass with plain capacity locates the band crossings
        (membership from the pre-step temperature alone lets a daily
        step jump clean over a 2 K band), then the corrector re-solves
        with the augmented capacity.  The band width matches
        ``freeze_impedance``'s ice ramp, which diagnoses ice fraction
        from the same temperatures.

    Returns the updated ``[n, nl]`` temperatures.
    """
    from . import constants as c

    nl = t_soil.shape[1]
    t = unstack(t_soil)
    th = unstack(theta)
    ts = unstack(theta_s)
    dz = [dz_mm[i] / 1000.0 for i in range(nl)]      # m
    zc = [zc_mm[i] / 1000.0 for i in range(nl)]      # m

    # Moisture-dependent thermal properties per layer.
    k_l: List[jnp.ndarray] = []
    cv: List[jnp.ndarray] = []
    for i in range(nl):
        se = jnp.clip(th[i] / ts[i], 0.0, 1.0)
        k_l.append(K_DRY + (K_SAT - K_DRY) * se)
        cv.append(C_SOLID * (1.0 - ts[i]) + C_WATER * th[i])

    # Interface conductance g_i between nodes i and i+1 (W/m^2/K).
    g_if: List[jnp.ndarray] = []
    for i in range(nl - 1):
        k_int = 0.5 * (k_l[i] + k_l[i + 1])
        g_if.append(k_int / (zc[i + 1] - zc[i]))

    def solve(cv_eff):
        # Implicit tridiagonal assembly:
        #   cv_i dz_i / dt (T'_i - T_i) = g_{i-1}(T'_{i-1}-T'_i)
        #                                 - g_i(T'_i - T'_{i+1}) + [G]_top
        a: List[jnp.ndarray] = []
        b: List[jnp.ndarray] = []
        cc: List[jnp.ndarray] = []
        r: List[jnp.ndarray] = []
        for i in range(nl):
            diag = cv_eff[i] * dz[i] / dt
            rhs = diag * t[i]
            lower = g_if[i - 1] if i > 0 else None
            upper = g_if[i] if i < nl - 1 else None
            bi = diag
            if lower is not None:
                bi = bi + lower
            if upper is not None:
                bi = bi + upper
            if i == 0:
                rhs = rhs + g_flux
                if t_air is not None:
                    bi = bi + h_surf
                    rhs = rhs + h_surf * t_air
            a.append(-lower if lower is not None
                     else jnp.zeros_like(diag))
            b.append(bi)
            cc.append(-upper if upper is not None
                      else jnp.zeros_like(diag))
            r.append(rhs)
        return _thomas_solve(a, b, cc, r)

    t_new = solve(cv)
    if latent_ramp > 0.0:
        cv_aug: List[jnp.ndarray] = []
        for i in range(nl):
            lo = jnp.minimum(t[i], t_new[i])
            hi = jnp.maximum(t[i], t_new[i])
            crosses = ((lo < c.TF)
                       & (hi > c.TF - latent_ramp)).astype(cv[i].dtype)
            cv_aug.append(cv[i] + crosses * (c.RHOW * c.LFUS * th[i]
                                             / latent_ramp))
        t_new = solve(cv_aug)
    return stack(t_new)


def column_energy(t_soil: jnp.ndarray, theta: jnp.ndarray,
                  theta_s: jnp.ndarray, dz_mm) -> jnp.ndarray:
    """Column heat content (J/m^2) for conservation diagnostics."""
    nl = t_soil.shape[1]
    total = None
    for i in range(nl):
        cv = C_SOLID * (1.0 - theta_s[:, i]) + C_WATER * theta[:, i]
        term = cv * (dz_mm[i] / 1000.0) * t_soil[:, i]
        total = term if total is None else total + term
    return total


def phase_change(t_soil: jnp.ndarray, liq_mm: jnp.ndarray,
                 ice_mm: jnp.ndarray, theta_s: jnp.ndarray, dz_mm
                 ) -> tuple:
    """Explicit CLM-style soil freeze/thaw: sensible heat <-> ice mass.

    Runs once per day after the plain-capacity temperature solve (use
    ``latent_ramp=0`` there — this replaces the apparent-capacity proxy
    with a real prognostic ice store).  Per layer:

      freeze = min(liq - watmin, hc (TF - T) / L_f)   where T < TF
      melt   = min(ice,          hc (T - TF) / L_f)   where T > TF
      T' = T + (freeze - melt) L_f / hc

    with hc the layer heat content per kelvin (J/m^2/K) and L_f the
    fusion enthalpy per mm of water (1 mm = 1 kg/m^2, so L_f = LFUS
    J/m^2/mm).  By construction T' cannot overshoot TF from either
    side, total water ``liq + ice`` is invariant, and the energy
    exchanged is exactly ``(freeze - melt) * L_f`` — both conservation
    laws hold to round-off.  The ``watmin`` floor (the reference's
    minimum layer water, HYDROLOGY.f90:1156) keeps a trace of liquid so
    the Richards solve never sees a fully dry layer.

    Args:
      t_soil: ``[n, nl]`` layer temperatures (K), post heat solve.
      liq_mm: ``[n, nl]`` liquid water (mm).
      ice_mm: ``[n, nl]`` ice (mm).
      theta_s: ``[n, nl]`` porosity (for the solids' heat capacity).
      dz_mm: static layer thicknesses (mm, tuple).

    Returns ``(t_new, liq_new, ice_new)``.
    """
    from . import constants as c

    dz_m = jnp.asarray(dz_mm, t_soil.dtype)[None, :] / 1000.0
    th_liq = liq_mm / (dz_m * 1000.0)
    th_ice = ice_mm / (dz_m * 1000.0)
    hc = (C_SOLID * (1.0 - theta_s) + C_WATER * th_liq
          + C_ICE * th_ice) * dz_m                      # J/m^2/K
    cold = jnp.maximum(c.TF - t_soil, 0.0)
    warm = jnp.maximum(t_soil - c.TF, 0.0)
    freeze = jnp.minimum(jnp.maximum(liq_mm - WATMIN, 0.0),
                         hc * cold / c.LFUS)
    melt = jnp.minimum(ice_mm, hc * warm / c.LFUS)
    t_new = t_soil + (freeze - melt) * c.LFUS / hc
    return t_new, liq_mm - freeze + melt, ice_mm + freeze - melt


def freeze_impedance_from_ice(liq_mm: jnp.ndarray, ice_mm: jnp.ndarray,
                              omega: float = 6.0) -> jnp.ndarray:
    """Hydraulic impedance from the prognostic ice store, ``[n, nl]``:
    the CLM ``f = 10^(-omega * F_ice)`` (Swenson et al. 2012) with the
    TRUE ice mass fraction ``F_ice = ice / (liq + ice)`` instead of
    ``freeze_impedance``'s temperature-ramp proxy.  Ice-free soil
    returns exactly 1.
    """
    f_ice = ice_mm / jnp.maximum(liq_mm + ice_mm, 1e-12)
    return jnp.power(10.0, -omega * f_ice)


def freeze_impedance(t_soil: jnp.ndarray, omega: float = 6.0,
                     ramp_k: float = 2.0) -> jnp.ndarray:
    """Hydraulic impedance of (partially) frozen layers, ``[n, nl]``.

    New capability beyond the reference (which has no soil freezing):
    the CLM-style ice impedance ``f = 10^(-omega * F_ice)`` (Swenson et
    al. 2012; omega = 6), with the frozen fraction approximated by a
    linear ramp ``F_ice = clip((TF - T) / ramp_k, 0, 1)`` in lieu of a
    prognostic ice store.  Multiplies interface hydraulic conductivity
    and the infiltration capacity in the substep (soilwater.py,
    hydrology.py); impedance only scales conductances, so water
    conservation is untouched.  Unfrozen soil returns exactly 1.
    """
    from . import constants as c

    f_ice = jnp.clip((c.TF - t_soil) / ramp_k, 0.0, 1.0)
    return jnp.power(10.0, -omega * f_ice)
