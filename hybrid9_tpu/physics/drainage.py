"""Water-table update, baseflow and soil-moisture fix-ups, vectorized.

TPU-native batched implementation of the reference's CESM 'Drainage' phase
(SOURCE/HYDROLOGY.f90:911-1216): aquifer/water-table accounting with
analytical specific yield, TOPMODEL baseflow, the saturation-excess bucket
cascade, and the watmin floor borrowing passes.

The reference's data-dependent layer walks with early EXITs
(HYDROLOGY.f90:961-994, 1075-1098, 1183-1198) become fixed 8-iteration
sweeps with per-cell "active" masks — each iteration is a fused elementwise
op over all cells, and a cell's lane simply stops changing once its walk
would have exited.  Per-layer water is a Python list of ``[n]`` arrays
(layers.py), so the whole phase is scatter-free elementwise work.
Semantics match the column oracle exactly, including the reference's
quirks (the stale ``zwtmm`` used inside the walks, and jwt NOT being
recomputed after the below-column recharge branch).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp

from . import constants as c
from .soilwater import water_table_index


class DrainageResult(NamedTuple):
    h2osoi: List[jnp.ndarray]   # 8 x [n] layer water after fix-ups   (mm)
    zwt: jnp.ndarray            # [n] water table depth                (m)
    wa: jnp.ndarray             # [n] aquifer store                   (mm)
    rsub_top: jnp.ndarray       # [n] topographic baseflow          (mm/s)
    qflx_rsub_sat: jnp.ndarray  # [n] saturation-excess drainage    (mm/s)
    rnff: List[jnp.ndarray]     # 9 x [n] per-layer drainage diagnostic


def _specific_yield(theta_s_l: jnp.ndarray, psi_s_l: jnp.ndarray,
                    bsw_l: jnp.ndarray, zwtmm: jnp.ndarray) -> jnp.ndarray:
    """Analytical specific yield, floored at 0.02.

    Reference: HYDROLOGY.f90:937-941 and the per-layer uses inside the
    walks.
    """
    s_y = theta_s_l * (1.0 - (1.0 + zwtmm / (-psi_s_l)) ** (-1.0 / bsw_l))
    return jnp.maximum(s_y, 0.02)


def compute_specific_yields(zwt: jnp.ndarray, theta_s: List[jnp.ndarray],
                            psi_s: List[jnp.ndarray],
                            bsw: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Per-layer specific-yield profile at the current water table.

    Companion to soilwater.compute_equilibrium_zq: the profile costs one
    pow per layer and depends only on ``zwt`` (which moves millimetres
    per substep) and static soil parameters, so the substep loops refresh
    it on the same ``zd09_every`` cadence instead of evaluating it twice
    per substep (stale + post-recharge tables, 16 pows at nl=8).  A stale
    profile perturbs only the water-table *trajectory* (zwt moves by
    ql / s_y) and the per-layer split of baseflow — every water move in
    the drainage walks is remainder-accounted, so mass conservation is
    exact regardless of s_y (see the rem/rem_b bookkeeping in
    :func:`drainage`).
    """
    zwtmm = 1000.0 * zwt
    return [_specific_yield(theta_s[i], psi_s[i], bsw[i], zwtmm)
            for i in range(len(theta_s))]


def drainage(h2osoi: List[jnp.ndarray], zwt: jnp.ndarray, wa: jnp.ndarray,
             qcharge: jnp.ndarray, theta_s: List[jnp.ndarray],
             psi_s: List[jnp.ndarray], bsw: List[jnp.ndarray],
             eff_porosity: List[jnp.ndarray], zi: jnp.ndarray,
             dz_soil: jnp.ndarray, dt: float,
             s_y_prof: List[jnp.ndarray] = None) -> DrainageResult:
    """Drainage phase for all cells; returns updated state and fluxes.

    ``s_y_prof`` optionally supplies a precomputed specific-yield profile
    (:func:`compute_specific_yields`, refreshed on the zd09_every
    cadence); when given it replaces BOTH per-substep evaluations (the
    stale-table set and the post-recharge set), saving 2 pows per layer
    per substep at the cost of a slightly stale yield — mass conservation
    is unaffected (see compute_specific_yields).
    """
    nl = len(h2osoi)
    h = list(h2osoi)

    # --- Water-table response to recharge (HYDROLOGY.f90:920-1009) -------
    zwtmm = 1000.0 * zwt                       # stale during the walks
    jwt = water_table_index(zwt, zi)
    below = jwt == nl
    in_col = jnp.logical_not(below)
    # Per-layer specific yields at the stale zwtmm, computed once and
    # shared by rous and both table walks (one pow per layer, not three).
    # NB the walks below rebind the bare name ``s_y`` as per-layer
    # scratch, so the cached profile must NOT be called ``s_y``.
    s_y_stale = s_y_prof if s_y_prof is not None else [
        _specific_yield(theta_s[i], psi_s[i], bsw[i], zwtmm)
        for i in range(nl)]
    rous = s_y_stale[nl - 1]

    # Below the column: recharge moves the aquifer store directly.
    wa_b = wa + qcharge * dt
    zwt_b = zwt - (qcharge * dt) / 1000.0 / rous

    # Inside the column: walk layers to re-locate the table.
    qtot = qcharge * dt
    rising = in_col & (qtot > 0.0)
    falling = in_col & (qtot <= 0.0)

    zwt_w = zwt
    # Rising walk: Fortran I = jwt+1 .. 1 stepping up; fixed sweep from the
    # bottom with an activity mask (HYDROLOGY.f90:961-973).
    rem = jnp.where(rising, qtot, 0.0)
    for i in range(nl - 1, -1, -1):
        act = rising & (i <= jwt) & (rem > 0.0)
        s_y = s_y_stale[i]
        ql = jnp.maximum(jnp.minimum(rem, s_y * (zwtmm - zi[i])), 0.0)
        zwt_w = jnp.where(act, zwt_w - ql / s_y / 1000.0, zwt_w)
        rem = jnp.where(act, rem - ql, rem)

    # Falling walk: Fortran I = jwt+1 .. nlayers (HYDROLOGY.f90:977-994).
    rem_f = jnp.where(falling, qtot, 0.0)
    for i in range(nl):
        act = falling & (i >= jwt) & (rem_f < 0.0)
        s_y = s_y_stale[i]
        ql = jnp.minimum(jnp.maximum(rem_f, -s_y * (zi[i + 1] - zwtmm)),
                         0.0)
        rem_new = rem_f - ql
        zwt_w = jnp.where(
            act,
            jnp.where(rem_new >= 0.0, zwt_w - ql / s_y / 1000.0,
                      zi[i + 1] / 1000.0),
            zwt_w)
        rem_f = jnp.where(act, rem_new, rem_f)
    # Residual guard kept for faithfulness (dead in exact arithmetic;
    # HYDROLOGY.f90:993-994).
    zwt_w = jnp.where(falling & (rem_f > 0.0),
                      zwt_w - rem_f / 1000.0 / rous, zwt_w)

    zwt1 = jnp.where(below, zwt_b, zwt_w)
    wa1 = jnp.where(below, wa_b, wa)
    # The reference recomputes jwt only in the in-column branch
    # (HYDROLOGY.f90:997-1007).
    jwt1 = jnp.where(below, jwt, water_table_index(zwt1, zi))

    # --- Baseflow (HYDROLOGY.f90:1013-1123) -------------------------------
    zwtmm1 = 1000.0 * zwt1
    # The exp argument is guarded against pathological negative tables
    # (a mis-assembled solve once drove zwt1 to -1e5 m and the f32 exp
    # to inf -> wa = -inf); in every sane regime zwt1 >= 0 and the
    # guard is exact.  The state clamp to [0, 80] happens below, as in
    # the reference (HYDROLOGY.f90:1122-1123).
    rsub_top = c.RSUB_TOP_MAX * jnp.exp(-c.FFF * jnp.maximum(zwt1, -1.0))
    s_y_1 = s_y_prof if s_y_prof is not None else [
        _specific_yield(theta_s[i], psi_s[i], bsw[i], zwtmm1)
        for i in range(nl)]
    rous1 = s_y_1[nl - 1]
    below1 = jwt1 == nl
    in_col1 = jnp.logical_not(below1)
    zero = jnp.zeros_like(zwt)
    rnff: List[jnp.ndarray] = [zero] * (nl + 1)

    # Below the column: drain the aquifer; spill any excess over 5000 mm
    # into the bottom soil layer.
    wa_tmp = wa1 - rsub_top * dt
    zwt_b1 = zwt1 + (rsub_top * dt) / 1000.0 / rous1
    spill = jnp.maximum(0.0, wa_tmp - 5000.0)
    h[nl - 1] = h[nl - 1] + jnp.where(below1, spill, 0.0)
    wa_b1 = jnp.minimum(wa_tmp, 5000.0)
    rnff[nl] = jnp.where(below1, rsub_top, 0.0)

    # Inside the column: remove baseflow from saturated layers, walking
    # down with an activity mask (HYDROLOGY.f90:1064-1103).
    rem_b = jnp.where(in_col1, -rsub_top * dt, 0.0)
    zwt_w1 = zwt1
    for i in range(nl):
        act = in_col1 & (i >= jwt1) & (rem_b < 0.0)
        s_y = s_y_1[i]
        ql = jnp.minimum(jnp.maximum(rem_b, -(s_y * (zi[i + 1] - zwtmm1))),
                         0.0)
        h[i] = h[i] + jnp.where(act, ql, 0.0)
        rnff[i] = jnp.where(act, -ql, rnff[i])
        rem_new = rem_b - ql
        zwt_w1 = jnp.where(
            act,
            jnp.where(rem_new >= 0.0, zwt_w1 - ql / s_y / 1000.0,
                      zi[i + 1] / 1000.0),
            zwt_w1)
        rem_b = jnp.where(act, rem_new, rem_b)
    # Residual baseflow comes out of the aquifer (HYDROLOGY.f90:1100-1102).
    zwt_w1 = jnp.where(in_col1, zwt_w1 - rem_b / 1000.0 / rous1, zwt_w1)
    wa2 = jnp.where(below1, wa_b1, wa1 + rem_b)
    rnff[nl] = rnff[nl] + jnp.where(in_col1, -rem_b, 0.0)

    zwt2 = jnp.where(below1, zwt_b1, zwt_w1)
    jwt2 = jnp.where(below1, jwt1, water_table_index(zwt2, zi))

    # Clamps (HYDROLOGY.f90:1122-1123).
    zwt2 = jnp.clip(zwt2, 0.0, 80.0)

    # --- Saturation-excess bucket cascade, bottom-up
    # (HYDROLOGY.f90:1131-1137).
    for i in range(nl - 1, 0, -1):
        cap = eff_porosity[i] * dz_soil[i]
        xsi = jnp.maximum(h[i] - cap, 0.0)
        h[i] = jnp.minimum(cap, h[i])
        h[i - 1] = h[i - 1] + xsi

    # Top-layer excess to drainage (HYDROLOGY.f90:1144-1152).
    cap0 = jnp.maximum(0.0, theta_s[0] * dz_soil[0])
    xs1 = jnp.maximum(jnp.maximum(h[0], 0.0) - cap0, 0.0)
    h[0] = jnp.minimum(cap0, h[0])
    qflx_rsub_sat = xs1 / dt

    # --- watmin floor: borrow from the layer below
    # (HYDROLOGY.f90:1161-1174).  Fortran layer number i+1 vs jwt.
    for i in range(nl - 1):
        short = h[i] < c.WATMIN
        xs = jnp.where(short, c.WATMIN - h[i], 0.0)
        zwt2 = zwt2 + jnp.where(short & (jwt2 == i + 1),
                                xs / eff_porosity[i] / 1000.0, 0.0)
        h[i] = h[i] + xs
        h[i + 1] = h[i + 1] - xs

    # --- Bottom layer: search upward for water
    # (HYDROLOGY.f90:1180-1211).  take = min(xs, available) reproduces the
    # move-and-exit semantics of the reference loop.
    xs = jnp.where(h[nl - 1] < c.WATMIN, c.WATMIN - h[nl - 1], 0.0)
    for j in range(nl - 2, -1, -1):
        avail = jnp.maximum(h[j] - c.WATMIN - xs, 0.0)
        take = jnp.minimum(xs, avail)
        h[nl - 1] = h[nl - 1] + take
        h[j] = h[j] - take
        xs = xs - take
    # Any un-met deficit is created and taken back out of drainage
    # (HYDROLOGY.f90:1204-1211).
    h[nl - 1] = h[nl - 1] + xs
    rsub_top = rsub_top - xs / dt

    return DrainageResult(h2osoi=h, zwt=zwt2, wa=wa2,
                          rsub_top=rsub_top, qflx_rsub_sat=qflx_rsub_sat,
                          rnff=rnff)
