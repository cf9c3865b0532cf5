"""Vertical soil-water movement: ZD09 equilibrium + batched Richards solve.

TPU-native batched implementation of the reference's CESM 'SoilWater' phase
(SOURCE/HYDROLOGY.f90:485-909): Zeng & Decker (2009) equilibrium profile,
Clapp-Hornberger matric potentials (Oleson et al. 2013 Eqn 7.94),
tridiagonal assembly (O13 Eqns 7.116-7.141) and a batched Thomas solve
(Press et al. 1989 §2.6) — the 9-layer recurrence is unrolled (layers are
tiny) while the cell axis stays vectorized on the VPU.

All branches of the reference become ``jnp.where`` selects; potentially
invalid lanes are fed safe operands so no NaN/Inf contaminates the selected
branch.  Per-layer fields are Python lists of ``[n]`` arrays (see
layers.py) so the whole phase is pure elementwise work that XLA fuses into
a few VPU kernels.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax.numpy as jnp

from . import constants as c
from .layers import select_layer


class SoilWaterResult(NamedTuple):
    h2osoi: List[jnp.ndarray]   # 8 x [n] updated layer water         (mm)
    smp: List[jnp.ndarray]      # 8 x [n] matric potential (carry)    (mm)
    qcharge: jnp.ndarray        # [n] aquifer recharge              (mm/s)
    jwt: jnp.ndarray            # [n] int32 first-unsaturated index    (-)
    dwat_aq: jnp.ndarray        # [n] aquifer-layer solution increment (-)


def water_table_index(zwt: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """jwt: number of soil interfaces strictly above the water table.

    0 when the table is in the top layer, 8 when below the column.
    Vectorized form of the scan at HYDROLOGY.f90:499-508: jwt is the count
    of interfaces zi(1..8) with ``zwt > zi/1000``.  Unrolled sum of
    elementwise compares (no reductions over a strided axis).
    """
    jwt = None
    for i in range(1, len(zi) - 1):
        above = (zwt > zi[i] / 1000.0).astype(jnp.int32)
        jwt = above if jwt is None else jwt + above
    return jwt


def _equilibrium_profile(zwtmm: jnp.ndarray, jwt: jnp.ndarray,
                         theta_s: List[jnp.ndarray],
                         psi_s: List[jnp.ndarray], bsw: List[jnp.ndarray],
                         zi: jnp.ndarray) -> List[jnp.ndarray]:
    """Zeng & Decker (2009) equilibrium potential ``zq`` per layer.

    Returns a list of nl+1 ``[n]`` arrays (last = virtual aquifer layer,
    valid only where jwt == nl).  Reference: HYDROLOGY.f90:512-590.
    """
    nl = len(theta_s)
    zq: List[jnp.ndarray] = []
    for i in range(nl):
        ts, ps, bs = theta_s[i], psi_s[i], bsw[i]
        zlo, zhi = zi[i], zi[i + 1]
        mask_sat = zwtmm <= zlo
        mask_in = (zwtmm < zhi) & (zwtmm > zlo)
        mask_below = jnp.logical_not(mask_sat | mask_in)
        expo = 1.0 - 1.0 / bs
        neg_psi = -ps

        # The "table inside" and "table below" branches both raise
        # (neg_psi + zwtmm - zlo)/neg_psi to expo, under exclusive masks;
        # one shared pow serves both (lanes outside either mask get base
        # 1.0, and their branch values are discarded by the final select).
        base_lo = jnp.where(mask_in | mask_below,
                            (neg_psi + zwtmm - zlo) / neg_psi, 1.0)
        temp0_lo = base_lo ** expo

        # Table inside the layer: blend saturated part below the table
        # with the equilibrium solution above it.
        den_in = jnp.where(mask_in, zwtmm - zlo, 1.0)
        voleq1 = ps * ts / (1.0 - 1.0 / bs) / den_in * (1.0 - temp0_lo)
        vol_in = (voleq1 * (zwtmm - zlo) + ts * (zhi - zwtmm)) \
            / (zhi - zlo)
        vol_in = jnp.maximum(jnp.minimum(ts, vol_in), 0.0)

        # Table below the layer: closed-form layer average.
        base_hi = jnp.where(mask_below,
                            (neg_psi + zwtmm - zhi) / neg_psi, 1.0)
        vol_below = ps * ts / (1.0 - 1.0 / bs) / (zhi - zlo) \
            * (base_hi ** expo - temp0_lo)
        vol_below = jnp.minimum(ts, jnp.maximum(vol_below, 0.0))

        vol_eq = jnp.where(mask_sat, ts,
                           jnp.where(mask_in, vol_in, vol_below))
        zq_i = ps * jnp.maximum(vol_eq / ts, 0.01) ** (-bs)
        zq.append(jnp.maximum(c.SMPMIN, zq_i))

    zq.append(_aquifer_zq(zwtmm, jwt, theta_s[-1], psi_s[-1], bsw[-1],
                          zi, nl))
    return zq


def _aquifer_zq(zwtmm: jnp.ndarray, jwt: jnp.ndarray,
                tsl: jnp.ndarray, psl: jnp.ndarray, bl: jnp.ndarray,
                zi: jnp.ndarray, nl: int) -> jnp.ndarray:
    """Virtual aquifer-layer equilibrium potential ``zq[nl]``.

    Only meaningful when the table is below the column
    (HYDROLOGY.f90:574-590); uses bottom-layer soil properties and is
    ZERO where ``jwt < nl``.  Because of that branch gate this entry is
    DISCONTINUOUS in zwt at the column bottom (it jumps 0 -> ~psi_s as
    the table crosses zi(nl)), so unlike the per-layer entries it must
    never be served stale: a cell whose table crosses below-column
    between ``zd09_every`` refreshes would otherwise feed a zeroed
    ``zq[nl]`` into the aquifer coupling of the implicit solve,
    mis-assembling the matrix tail (observed in round 4 as a
    year-1902 wa -> -inf blowup of a knife-edge cell pinned at
    zwt == zi(8); see soil_water_update).
    """
    maskq = jwt == nl
    base_aq = jnp.where(maskq, (-psl + zwtmm - zi[nl]) / (-psl), 1.0)
    temp0_aq = base_aq ** (1.0 - 1.0 / bl)
    den_aq = jnp.where(maskq, zwtmm - zi[nl], 1.0)
    vol_aq = psl * tsl / (1.0 - 1.0 / bl) / den_aq * (1.0 - temp0_aq)
    vol_aq = jnp.minimum(tsl, jnp.maximum(vol_aq, 0.0))
    zq_aq = jnp.maximum(c.SMPMIN,
                        psl * jnp.maximum(vol_aq / tsl, 0.01) ** (-bl))
    return jnp.where(maskq, zq_aq, 0.0)


def compute_equilibrium_zq(zwt: jnp.ndarray, theta_s: List[jnp.ndarray],
                           psi_s: List[jnp.ndarray],
                           bsw: List[jnp.ndarray],
                           zi: jnp.ndarray) -> List[jnp.ndarray]:
    """Standalone ZD09 equilibrium profile for a given water table.

    Used by the substep loops to refresh the profile every
    ``zd09_every`` substeps instead of recomputing its ~26 pow
    evaluations per substep (PERFORMANCE.md "speed-of-light" section):
    the profile depends only on ``zwt`` and static soil parameters, and
    ``zwt`` moves millimetres per day, so a stale profile changes the
    *accuracy* of the equilibrium correction, never mass conservation
    (the same zq enters layer i's outflow and layer i+1's inflow).
    """
    zwtmm = 1000.0 * zwt
    jwt = water_table_index(zwt, zi)
    return _equilibrium_profile(zwtmm, jwt, theta_s, psi_s, bsw, zi)


def _conductivity_and_potential(theta: List[jnp.ndarray],
                                theta_s: List[jnp.ndarray],
                                hksat: List[jnp.ndarray],
                                psi_s: List[jnp.ndarray],
                                bsw: List[jnp.ndarray],
                                imp: Optional[List[jnp.ndarray]] = None):
    """Interface conductivity, matric potential and their derivatives.

    Reference: HYDROLOGY.f90:598-639 (O13 Eqn 7.94 and neighbours).
    ``imp`` optionally supplies per-layer frozen-soil impedance factors
    (soiltemp.freeze_impedance); the interface conductivity is scaled by
    the more restrictive of the two adjacent layers (CLM convention).
    Returns (hk, dhkdw, smp, dsmpdw), each a list of nl ``[n]`` arrays.
    """
    nl = len(theta)
    hk, dhkdw, smp, dsmpdw = [], [], [], []
    for i in range(nl):
        inext = min(nl - 1, i + 1)
        s1 = 0.5 * (theta[i] + theta[inext]) \
            / (0.5 * (theta_s[i] + theta_s[inext]))
        s1 = jnp.minimum(1.0, s1)
        s2 = hksat[i] * s1 ** (2.0 * bsw[i] + 2.0)
        if imp is not None:
            s2 = s2 * jnp.minimum(imp[i], imp[inext])
        hk.append(s1 * s2)
        dhkdw.append((2.0 * bsw[i] + 3.0) * s2
                     * (1.0 / (theta_s[i] + theta_s[inext])))
        s_node = jnp.clip(theta[i] / theta_s[i], 0.01, 1.0)
        smp_i = jnp.maximum(c.SMPMIN, psi_s[i] * s_node ** (-bsw[i]))
        smp.append(smp_i)
        dsmpdw.append(-bsw[i] * smp_i / (s_node * theta_s[i]))
    return hk, dhkdw, smp, dsmpdw


def _thomas_solve(a: List[jnp.ndarray], b: List[jnp.ndarray],
                  cc: List[jnp.ndarray], r: List[jnp.ndarray]
                  ) -> List[jnp.ndarray]:
    """Batched Thomas algorithm, unrolled over the 9 layers.

    Each list entry is an ``[n]`` array; the recurrence runs over the short
    layer axis while every step is a fused elementwise op over cells
    (reference: HYDROLOGY.f90:806-837, Press et al. 1989 §2.6).
    """
    n_eq = len(b)
    bet = b[0]
    dw = [r[0] / bet]
    gam: List[jnp.ndarray] = [jnp.zeros_like(bet)]
    for i in range(1, n_eq):
        g = cc[i - 1] / bet
        bet = b[i] - a[i] * g
        dw.append((r[i] - a[i] * dw[i - 1]) / bet)
        gam.append(g)
    for i in range(n_eq - 2, -1, -1):
        dw[i] = dw[i] - gam[i + 1] * dw[i + 1]
    return dw


def _tridiag_matvec(a: List[jnp.ndarray], b: List[jnp.ndarray],
                    cc: List[jnp.ndarray], x: List[jnp.ndarray]
                    ) -> List[jnp.ndarray]:
    """y = T x for the tridiagonal (a: sub, b: diag, cc: super)."""
    n_eq = len(b)
    y = []
    for i in range(n_eq):
        yi = b[i] * x[i]
        if i > 0:
            yi = yi + a[i] * x[i - 1]
        if i < n_eq - 1:
            yi = yi + cc[i] * x[i + 1]
        y.append(yi)
    return y


def _thomas_solve_refined(a, b, cc, r) -> List[jnp.ndarray]:
    """Thomas solve plus one step of iterative refinement.

    The f32 solve loses ~3-4 digits when a near-dry layer drives matric
    potentials toward the -1e8 clamp (huge dsmpdw entries -> badly
    scaled rows); one refinement step (solve T e = r - T x, x += e)
    recovers most of the lost accuracy for ~60 extra elementwise ops —
    small next to the ~500-op substep.  In float64 the correction is
    O(1e-16) and parity with the oracle is unaffected.
    """
    dw = _thomas_solve(a, b, cc, r)
    t_dw = _tridiag_matvec(a, b, cc, dw)
    resid = [r[i] - t_dw[i] for i in range(len(r))]
    err = _thomas_solve(a, b, cc, resid)
    return [dw[i] + err[i] for i in range(len(dw))]


def soil_water_update(h2osoi: List[jnp.ndarray], theta: List[jnp.ndarray],
                      zwt: jnp.ndarray, theta_s: List[jnp.ndarray],
                      hksat: List[jnp.ndarray], psi_s: List[jnp.ndarray],
                      bsw: List[jnp.ndarray], qflx_infl: jnp.ndarray,
                      qflx_tran_veg: jnp.ndarray,
                      rootr: List[jnp.ndarray], zi: jnp.ndarray,
                      dz_soil: jnp.ndarray, zc_soil: jnp.ndarray,
                      dt: float,
                      imp: Optional[List[jnp.ndarray]] = None,
                      zq: Optional[List[jnp.ndarray]] = None
                      ) -> SoilWaterResult:
    """One implicit vertical soil-water step for all cells.

    Per-layer args are lists of ``[n]`` arrays; ``zi [10]``,
    ``dz_soil``, ``zc_soil`` are static geometry (mm); ``imp`` is the
    optional frozen-soil impedance per layer; ``zq`` an optionally
    precomputed ZD09 profile (:func:`compute_equilibrium_zq`) — when
    given, the per-substep recomputation is skipped.
    """
    nl = len(h2osoi)
    zwtmm = 1000.0 * zwt
    jwt = water_table_index(zwt, zi)
    in_col = jwt < nl          # water table inside the soil column
    below = jnp.logical_not(in_col)

    if zq is None:
        zq = _equilibrium_profile(zwtmm, jwt, theta_s, psi_s, bsw, zi)
    else:
        # Cached profile (zd09_every > 1): the nl per-layer entries are
        # continuous in zwt and safe to serve a few substeps stale, but
        # the branch-gated aquifer entry is NOT (see _aquifer_zq) —
        # recompute it fresh at the CURRENT table position (2 pows, vs
        # the ~26 the cache saves).
        zq = list(zq[:nl]) + [_aquifer_zq(zwtmm, jwt, theta_s[-1],
                                          psi_s[-1], bsw[-1], zi, nl)]
    hk, dhkdw, smp, dsmpdw = _conductivity_and_potential(
        theta, theta_s, hksat, psi_s, bsw, imp)

    # Aquifer-layer geometry (HYDROLOGY.f90:643-650).
    zc_aq = 0.5 * (zwtmm + zc_soil[nl - 1])
    dz_aq = jnp.where(in_col, dz_soil[nl - 1], zwtmm - zc_soil[nl - 1])

    # --- Tridiagonal assembly (O13 7.116-7.141) ---------------------------
    a: List[jnp.ndarray] = [None] * (nl + 1)  # type: ignore
    b: List[jnp.ndarray] = [None] * (nl + 1)  # type: ignore
    cc: List[jnp.ndarray] = [None] * (nl + 1)  # type: ignore
    r: List[jnp.ndarray] = [None] * (nl + 1)  # type: ignore

    # Top layer.
    den = zc_soil[1] - zc_soil[0]
    num = (smp[1] - smp[0]) - (zq[1] - zq[0])
    qout0 = -hk[0] * num / den
    dqodw1 = -(-hk[0] * dsmpdw[0] + num * dhkdw[0]) / den
    dqodw2 = -(hk[0] * dsmpdw[1] + num * dhkdw[0]) / den
    r[0] = qflx_infl - qout0 - qflx_tran_veg * rootr[0]
    a[0] = jnp.zeros_like(qflx_infl)
    b[0] = dz_soil[0] / dt + dqodw1
    cc[0] = dqodw2

    # Interior layers 2..7 (0-based 1..6).
    for i in range(1, nl - 1):
        den_in = zc_soil[i] - zc_soil[i - 1]
        num_in = smp[i] - smp[i - 1] - (zq[i] - zq[i - 1])
        qin_i = -hk[i - 1] * num_in / den_in
        dqidw0 = -(-hk[i - 1] * dsmpdw[i - 1]
                   + num_in * dhkdw[i - 1]) / den_in
        dqidw1 = -(hk[i - 1] * dsmpdw[i]
                   + num_in * dhkdw[i - 1]) / den_in
        den_out = zc_soil[i + 1] - zc_soil[i]
        num_out = (smp[i + 1] - smp[i]) - (zq[i + 1] - zq[i])
        qout_i = -hk[i] * num_out / den_out
        dqodw1 = -(-hk[i] * dsmpdw[i] + num_out * dhkdw[i]) / den_out
        dqodw2 = -(hk[i] * dsmpdw[i + 1] + num_out * dhkdw[i]) / den_out
        r[i] = qin_i - qout_i - qflx_tran_veg * rootr[i]
        a[i] = -dqidw0
        b[i] = dz_soil[i] / dt - dqidw1 + dqodw1
        cc[i] = dqodw2

    # Bottom soil layer (0-based nl-1) and aquifer layer: two variants
    # selected per cell on water-table position (HYDROLOGY.f90:712-799).
    i = nl - 1
    den_in = zc_soil[i] - zc_soil[i - 1]
    num_in = smp[i] - smp[i - 1] - (zq[i] - zq[i - 1])
    qin_bot = -hk[i - 1] * num_in / den_in
    dqidw0 = -(-hk[i - 1] * dsmpdw[i - 1]
               + num_in * dhkdw[i - 1]) / den_in
    dqidw1 = -(hk[i - 1] * dsmpdw[i]
               + num_in * dhkdw[i - 1]) / den_in

    # Variant B (table below the column): aquifer coupling.
    s_node_aq = jnp.clip(0.5 * (1.0 + theta[i] / theta_s[i]), 0.01, 1.0)
    smp_aq = jnp.maximum(c.SMPMIN,
                         psi_s[i] * s_node_aq ** (-bsw[i]))
    dsmpdw_aq = -bsw[i] * smp_aq / (s_node_aq * theta_s[i])
    den_b = jnp.where(below, zc_aq - zc_soil[i], 1.0)
    num_b = smp_aq - smp[i] - (zq[nl] - zq[i])
    qout_b = -hk[i] * num_b / den_b
    dqodw1_b = -(-hk[i] * dsmpdw[i] + num_b * dhkdw[i]) / den_b
    dqodw2_b = -(hk[i] * dsmpdw_aq + num_b * dhkdw[i]) / den_b

    qout_bot = jnp.where(below, qout_b, 0.0)
    r[i] = qin_bot - qout_bot - qflx_tran_veg * rootr[i]
    a[i] = -dqidw0
    b[i] = jnp.where(below,
                     dz_soil[i] / dt - dqidw1 + dqodw1_b,
                     dz_soil[i] / dt - dqidw1)
    cc[i] = jnp.where(below, dqodw2_b, 0.0)

    r[nl] = jnp.where(below, qout_b, 0.0)
    a[nl] = jnp.where(below, -dqodw1_b, 0.0)
    b[nl] = jnp.where(below, dz_aq / dt - dqodw2_b, dz_aq / dt)
    cc[nl] = jnp.zeros_like(dz_aq)

    # --- Batched Thomas solve and state update ----------------------------
    dw = _thomas_solve_refined(a, b, cc, r)
    h2osoi_new = [h2osoi[i] + dw[i] * dz_soil[i] for i in range(nl)]

    # --- Aquifer recharge (HYDROLOGY.f90:856-904) -------------------------
    # Table inside the column: Darcy flux between the deepest unsaturated
    # node and the table; below the column: aquifer-layer increment.
    # Per-cell layer picks are fusible select chains (layers.select_layer).
    th_j = select_layer(theta, jwt, fill=1.0)
    ts_j = select_layer(theta_s, jwt, fill=1.0)
    hk_j = select_layer(hksat, jwt, fill=0.0)
    b_j = select_layer(bsw, jwt, fill=1.0)
    s1q = jnp.clip(th_j / ts_j, 0.01, 1.0)
    ka = hk_j * s1q ** (2.0 * b_j + 3.0)
    jm = jnp.maximum(jwt - 1, 0)
    smp_jm = select_layer(smp, jm, fill=0.0)
    zq_jm = select_layer(zq[:nl], jm, fill=0.0)
    wh = jnp.maximum(c.SMPMIN, smp_jm) - zq_jm
    zc_jm = select_layer([zc_soil[i] * jnp.ones_like(zwtmm)
                          for i in range(nl)], jm, fill=0.0)
    den_q = jnp.where(jwt == 0, zwtmm + 1.0, (zwtmm - zc_jm) * 2.0)
    qcharge_in = jnp.clip(-ka * (0.0 - wh) / den_q, -10.0 / dt, 10.0 / dt)
    qcharge_below = dw[nl] * dz_aq / dt
    qcharge = jnp.where(in_col, qcharge_in, qcharge_below)

    return SoilWaterResult(h2osoi=h2osoi_new, smp=smp, qcharge=qcharge,
                           jwt=jwt, dwat_aq=dw[nl])
