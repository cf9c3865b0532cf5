"""Shuttleworth-Wallace (1985) dual-source Penman-Monteith ET, vectorized.

TPU-native batched implementation of the reference's ET block
(SOURCE/HYDROLOGY.f90:228-418): all cells advance together as ``[n]``
arrays; the reference's scalar branches become ``jnp.where`` selects.
Must agree with ``reference_column.hydrology_substep``'s ET stage.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

import jax.numpy as jnp

from . import constants as c


class ETResult(NamedTuple):
    qflx_tran_veg: jnp.ndarray   # [n] canopy transpiration          (mm/s)
    qflx_evap_grnd: jnp.ndarray  # [n] substrate evaporation, limited(mm/s)
    beta: jnp.ndarray            # [n] stomatal water-stress factor     (-)


def air_state(fd: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Air density, vapour-pressure slope, deficit, psychrometric const.

    Reference: HYDROLOGY.f90:228-263 (FAO-56 esat curve,
    www.fao.org/docrep/X0490E/x0490e07.htm).
    """
    tak = fd["tak"]
    tsv = tak * (1.0 + fd["huss"] * c.DELTX)
    rho = fd["ps"] / (c.RGAS * tsv)
    tc = tak - c.TF
    desatdT = (4098.0 * (0.6108 * jnp.exp(17.27 * tc / (tc + 237.3)))) \
        / ((tc + 237.3) ** 2)
    desatdT = desatdT * 18.0 / (c.GASC * tak)
    esat = 0.6108 * jnp.exp(17.27 * tc / (tc + 237.3))
    esat = esat * 18.0 / (c.GASC * tak)
    vdd = esat * (1.0 - fd["rh"] / 100.0)
    gamma = (c.CP_AIR * fd["ps"] / (fd["lamb"] * 0.622)) \
        * (18.0e-3 / (c.GASC * tak))
    return dict(rho=rho, desatdT=desatdT, vdd=vdd, gamma=gamma)


def daily_et_context(fd: Dict[str, jnp.ndarray], lai: jnp.ndarray
                     ) -> Dict[str, jnp.ndarray]:
    """Forcing/LAI-only ET terms, constant across a day's substeps.

    The substep loop re-evaluated these 48x per day although they depend
    only on the daily forcing and the (daily-updated) LAI: the air state
    (2 exp), the stomatal VPD attenuation (1 pow), the canopy/aero
    resistances, and the substrate net radiation (1 exp).  Hoisting them
    is bitwise-neutral — identical expressions on identical inputs —
    and removes ~4 of the substep's transcendentals plus a dozen
    divides.  Callers with per-substep forcing (site mode with sub-daily
    observations) simply rebuild the context each substep.
    """
    a = air_state(fd)
    rho = a["rho"]
    lai_safe = jnp.where(lai > 0.0, lai, 1.0)
    # Stomatal VPD attenuation (HYDROLOGY.f90:283-295).
    vpd_att = 2.8 ** (-80.0 * jnp.maximum(0.0, a["vdd"]) / rho)
    # Baldocchi et al. (2004) minimum resistance.
    rsc_min = 1.0 / ((lai_safe / 2.7) * 0.9 / (rho * 1.0e3 / 18.0))
    # Boundary/aerodynamic resistances (SW85 Eqns 20, 30, 31).
    rac = jnp.where(lai > 0.0, 25.0 / (2.0 * lai_safe), 1.0e6)
    raa = jnp.where(lai <= 4.0,
                    0.25 * lai * 42.0 + 0.25 * (4.0 - lai) * 34.0, 42.0)
    ras = jnp.where(lai <= 4.0,
                    0.25 * lai * 128.0 + 0.25 * (4.0 - lai) * 49.0, 128.0)
    # Substrate net radiation and ground heat flux (HYDROLOGY.f90:
    # 335-339).
    rnets = fd["rnet"] * jnp.exp(-0.7 * lai)
    g_soil = 0.2 * rnets
    return dict(rho=rho, desatdT=a["desatdT"], vdd=a["vdd"],
                gamma=a["gamma"], vpd_att=vpd_att, lai_safe=lai_safe,
                rsc_min=rsc_min, rac=rac, raa=raa, ras=ras, rnets=rnets,
                g_soil=g_soil)


def dual_source_et(theta: List[jnp.ndarray], theta_s: List[jnp.ndarray],
                   smp_prev: List[jnp.ndarray],
                   rootr: List[jnp.ndarray],
                   lai: jnp.ndarray, lai_litter: jnp.ndarray,
                   zc_soil: jnp.ndarray, dz0, dt: float,
                   fd: Dict[str, jnp.ndarray],
                   ctx: Dict[str, jnp.ndarray] = None) -> ETResult:
    """Dual-source ET with stomatal stress and top-layer supply limit.

    Args:
      theta: 8 x ``[n]`` volumetric water at substep start.
      theta_s: 8 x ``[n]`` saturated volumetric water.
      smp_prev: 8 x ``[n]`` matric potential carried from the previous
        substep (the reference's cross-step ``smp`` carry,
        HYDROLOGY.f90:271).
      rootr: 8 x ``[n]`` root fraction per layer.
      lai, lai_litter: ``[n]`` canopy / litter leaf area.
      zc_soil: ``[8]`` static node depths (mm).
      dz0: top-layer thickness (mm).
      dt: substep (s).
      fd: derived forcing dict (tak, rh, rnet, par, lamb, huss, ps).
      ctx: optional precomputed :func:`daily_et_context` (forcing/LAI
        terms constant across the day); rebuilt from ``fd`` when absent.
    """
    if ctx is None:
        ctx = daily_et_context(fd, lai)
    rho, desatdT = ctx["rho"], ctx["desatdT"]
    vdd, gamma = ctx["vdd"], ctx["gamma"]
    lai_safe = ctx["lai_safe"]

    # Root-weighted stomatal water stress (HYDROLOGY.f90:269-276).
    beta = None
    for i in range(len(rootr)):
        beta_l = 1.0 - (smp_prev[i] - zc_soil[i]) / (-150000.0)
        term = rootr[i] * jnp.clip(beta_l, 0.0, 1.0)
        beta = term if beta is None else beta + term

    # Canopy stomatal resistance (Shuttleworth Eqn 20 family;
    # HYDROLOGY.f90:283-295).  Guarded against the LAI/beta/PAR = 0 case.
    par = fd["par"]
    active = (lai > 0.0) & (beta > 0.0) & (par > 0.0)
    beta_safe = jnp.where(beta > 0.0, beta, 1.0)
    par_safe = jnp.where(par > 0.0, par, 1.0)
    rsc_a = (1.0 / (par_safe / (par_safe + 300.0))) * 400.0 / (
        2.0 * lai_safe * ctx["vpd_att"])
    # Divide by beta floored at exactly the cap point (rsc_a / RSC_MAX):
    # below it the capped resistance is RSC_MAX regardless, so the
    # result is unchanged — but the derivative of the capped branch
    # becomes 0 instead of ~1/beta^2, which under extreme stress
    # (beta ~ 1e-20) overflows f32 to Inf and poisons forward/reverse
    # AD through the whole substep (calibrate.py differentiates this).
    rsc_raw = rsc_a / jnp.maximum(beta_safe, rsc_a / c.RSC_MAX)
    rsc = jnp.where(active, rsc_raw, 1.0e6)
    # Baldocchi et al. (2004) minimum (HYDROLOGY.f90:295).
    rsc = jnp.where(lai > 0.0, jnp.maximum(rsc, ctx["rsc_min"]), rsc)
    # Cap: with beta underflowing toward 0, 1/beta overflows f32 to Inf
    # and Cc/Cs become Inf/Inf = NaN (the f32 reference has the same
    # hazard).  1e8 s/m is already a hermetically closed canopy.
    rsc = jnp.minimum(rsc, c.RSC_MAX)

    # Boundary/aerodynamic resistances (SW85 Eqns 20, 30, 31;
    # HYDROLOGY.f90:302-318) — from the daily context.
    rac, raa, ras = ctx["rac"], ctx["raa"], ctx["ras"]

    # Substrate resistance (van de Griend & Owe 1994 Eqn 20;
    # HYDROLOGY.f90:325-331).
    th0 = theta[0]
    rss = jnp.where(
        th0 <= 0.15,
        (10.0 + 1000.0 * lai_litter)
        * jnp.exp(0.3563 * 100.0 * (0.15 - th0)),
        10.0 + 1000.0 * lai_litter * (1.0 - th0 / theta_s[0]))

    # Dual-source Penman-Monteith (SW85 Eqns 12-13, 21;
    # HYDROLOGY.f90:335-389).
    rnet = fd["rnet"]
    rnets = ctx["rnets"]
    g_soil = ctx["g_soil"]
    pmc = (desatdT * (rnet - g_soil)
           + (rho * c.CP_AIR * vdd - desatdT * rac * (rnets - g_soil))
           / (raa + rac)) \
        / (desatdT + gamma * (1.0 + rsc / (raa + rac)))
    pms = (desatdT * (rnet - g_soil)
           + (rho * c.CP_AIR * vdd - desatdT * ras * (rnet - rnets))
           / (raa + ras)) \
        / (desatdT + gamma * (1.0 + rss / (raa + ras)))
    r_a = (desatdT + gamma) * raa
    r_s = (desatdT + gamma) * ras + gamma * rss
    r_c = (desatdT + gamma) * rac + gamma * rsc
    cc = 1.0 / (1.0 + r_c * r_a / (r_s * (r_c + r_a)))
    cs = 1.0 / (1.0 + r_s * r_a / (r_c * (r_s + r_a)))
    le = cc * pmc + cs * pms
    vdd0 = vdd + (desatdT * (rnet - g_soil) - (desatdT + gamma) * le) \
        * raa / (rho * c.CP_AIR)
    lec = (desatdT * (rnet - rnets) + rho * c.CP_AIR * vdd0 / rac) \
        / (desatdT + gamma * (1.0 + rsc / rac))
    les = (desatdT * (rnets - g_soil) + rho * c.CP_AIR * vdd0 / ras) \
        / (desatdT + gamma * (1.0 + rss / ras))
    qflx_tran_veg = lec * 1.0e3 / (c.RHOW * fd["lamb"])
    qflx_evap_grnd = les * 1.0e3 / (c.RHOW * fd["lamb"])

    # Limit substrate evaporation to available top-layer water
    # (HYDROLOGY.f90:396-400); reference compares volumetric theta to the
    # watmin constant, reproduced as-is.
    evap_max1 = dz0 * (th0 - c.WATMIN) / dt - qflx_tran_veg * rootr[0]
    evap_max1 = jnp.maximum(0.0, evap_max1)
    qflx_evap_grnd = jnp.minimum(evap_max1, qflx_evap_grnd)

    return ETResult(qflx_tran_veg=qflx_tran_veg,
                    qflx_evap_grnd=qflx_evap_grnd, beta=beta)
