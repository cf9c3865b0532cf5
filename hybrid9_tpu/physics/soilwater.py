"""Vertical soil-water movement: ZD09 equilibrium + batched Richards solve.

TPU-native batched implementation of the reference's CESM 'SoilWater' phase
(SOURCE/HYDROLOGY.f90:485-909): Zeng & Decker (2009) equilibrium profile,
Clapp-Hornberger matric potentials (Oleson et al. 2013 Eqn 7.94),
tridiagonal assembly (O13 Eqns 7.116-7.141) and a batched Thomas solve
(Press et al. 1989 §2.6) — the 9-layer recurrence is unrolled (layers are
tiny) while the cell axis stays vectorized on the VPU.

All branches of the reference become ``jnp.where`` selects; potentially
invalid lanes are fed safe operands so no NaN/Inf contaminates the selected
branch.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp

from . import constants as c


class SoilWaterResult(NamedTuple):
    h2osoi: jnp.ndarray    # [n, 8] updated layer water              (mm)
    smp: jnp.ndarray       # [n, 8] matric potential (for carry)     (mm)
    qcharge: jnp.ndarray   # [n] aquifer recharge                  (mm/s)
    jwt: jnp.ndarray       # [n] int32 first-unsaturated-layer index  (-)
    dwat_aq: jnp.ndarray   # [n] aquifer-layer solution increment     (-)


def water_table_index(zwt: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """jwt: number of soil interfaces strictly above the water table.

    0 when the table is in the top layer, 8 when below the column.
    Vectorized form of the scan at HYDROLOGY.f90:499-508: jwt is the count
    of interfaces zi(1..8) with ``zwt > zi/1000``.
    """
    above = zwt[:, None] > (zi[None, 1:c.NSOIL_LAYERS + 1] / 1000.0)
    return jnp.sum(above, axis=-1).astype(jnp.int32)


def _equilibrium_profile(zwtmm: jnp.ndarray, jwt: jnp.ndarray,
                         theta_s: jnp.ndarray, psi_s: jnp.ndarray,
                         bsw: jnp.ndarray, zi: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zeng & Decker (2009) equilibrium water content and potential.

    Returns ``(vol_eq, zq)`` with shape ``[n, 9]`` (index 8 = virtual
    aquifer layer, valid only where jwt == 8).
    Reference: HYDROLOGY.f90:512-590.
    """
    nl = c.NSOIL_LAYERS
    zlo = zi[None, :nl]          # [1, 8] upper interface of each layer
    zhi = zi[None, 1:nl + 1]     # [1, 8] lower interface
    zw = zwtmm[:, None]

    mask_sat = zw <= zlo                      # table above layer: saturated
    mask_in = (zw < zhi) & (zw > zlo)         # table inside layer
    # else: table below layer.

    expo = 1.0 - 1.0 / bsw
    neg_psi = -psi_s

    # Table inside the layer: blend saturated part below the table with the
    # equilibrium solution above it.
    base_in = jnp.where(mask_in, (neg_psi + zw - zlo) / neg_psi, 1.0)
    temp0_in = base_in ** expo
    den_in = jnp.where(mask_in, zw - zlo, 1.0)
    voleq1 = psi_s * theta_s / (1.0 - 1.0 / bsw) / den_in * (1.0 - temp0_in)
    vol_in = (voleq1 * (zw - zlo) + theta_s * (zhi - zw)) / (zhi - zlo)
    vol_in = jnp.maximum(jnp.minimum(theta_s, vol_in), 0.0)

    # Table below the layer: closed-form layer average of the equilibrium
    # profile.
    mask_below = jnp.logical_not(mask_sat | mask_in)
    base_hi = jnp.where(mask_below, (neg_psi + zw - zhi) / neg_psi, 1.0)
    base_lo = jnp.where(mask_below, (neg_psi + zw - zlo) / neg_psi, 1.0)
    tempi_b = base_hi ** expo
    temp0_b = base_lo ** expo
    vol_below = psi_s * theta_s / (1.0 - 1.0 / bsw) / (zhi - zlo) \
        * (tempi_b - temp0_b)
    vol_below = jnp.minimum(theta_s, jnp.maximum(vol_below, 0.0))

    vol_eq8 = jnp.where(mask_sat, theta_s,
                        jnp.where(mask_in, vol_in, vol_below))
    zq8 = psi_s * jnp.maximum(vol_eq8 / theta_s, 0.01) ** (-bsw)
    zq8 = jnp.maximum(c.SMPMIN, zq8)

    # Virtual aquifer layer, only meaningful when the table is below the
    # column (HYDROLOGY.f90:574-590); uses bottom-layer soil properties.
    tsl, psl, bl = theta_s[:, -1], psi_s[:, -1], bsw[:, -1]
    maskq = jwt == nl
    base_aq = jnp.where(maskq, (-psl + zwtmm - zi[nl]) / (-psl), 1.0)
    temp0_aq = base_aq ** (1.0 - 1.0 / bl)
    den_aq = jnp.where(maskq, zwtmm - zi[nl], 1.0)
    vol_aq = psl * tsl / (1.0 - 1.0 / bl) / den_aq * (1.0 - temp0_aq)
    vol_aq = jnp.minimum(tsl, jnp.maximum(vol_aq, 0.0))
    zq_aq = jnp.maximum(c.SMPMIN,
                        psl * jnp.maximum(vol_aq / tsl, 0.01) ** (-bl))
    zq_aq = jnp.where(maskq, zq_aq, 0.0)

    vol_eq = jnp.concatenate([vol_eq8, jnp.where(maskq, vol_aq, 0.0)[:, None]],
                             axis=1)
    zq = jnp.concatenate([zq8, zq_aq[:, None]], axis=1)
    return vol_eq, zq


def _conductivity_and_potential(theta: jnp.ndarray, theta_s: jnp.ndarray,
                                hksat: jnp.ndarray, psi_s: jnp.ndarray,
                                bsw: jnp.ndarray):
    """Interface conductivity, matric potential and their derivatives.

    Reference: HYDROLOGY.f90:598-639 (O13 Eqn 7.94 and neighbours).
    Returns (hk, dhkdw, smp, dsmpdw), each ``[n, 8]``.
    """
    theta_next = jnp.concatenate([theta[:, 1:], theta[:, -1:]], axis=1)
    ts_next = jnp.concatenate([theta_s[:, 1:], theta_s[:, -1:]], axis=1)
    s1 = 0.5 * (theta + theta_next) / (0.5 * (theta_s + ts_next))
    s1 = jnp.minimum(1.0, s1)
    s2 = hksat * s1 ** (2.0 * bsw + 2.0)
    hk = s1 * s2
    dhkdw = (2.0 * bsw + 3.0) * s2 * (1.0 / (theta_s + ts_next))
    s_node = jnp.clip(theta / theta_s, 0.01, 1.0)
    smp = jnp.maximum(c.SMPMIN, psi_s * s_node ** (-bsw))
    dsmpdw = -bsw * smp / (s_node * theta_s)
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


def soil_water_update(h2osoi: jnp.ndarray, theta: jnp.ndarray,
                      zwt: jnp.ndarray, theta_s: jnp.ndarray,
                      hksat: jnp.ndarray, psi_s: jnp.ndarray,
                      bsw: jnp.ndarray, qflx_infl: jnp.ndarray,
                      qflx_tran_veg: jnp.ndarray, rootr: jnp.ndarray,
                      zi: jnp.ndarray, dz_soil: jnp.ndarray,
                      zc_soil: jnp.ndarray, dt: float) -> SoilWaterResult:
    """One implicit vertical soil-water step for all cells.

    Args mirror the column oracle; ``zi [10]``, ``dz_soil [8]``,
    ``zc_soil [8]`` are static geometry (mm).
    """
    nl = c.NSOIL_LAYERS
    zwtmm = 1000.0 * zwt
    jwt = water_table_index(zwt, zi)
    in_col = jwt < nl          # water table inside the soil column
    below = jnp.logical_not(in_col)

    _, zq = _equilibrium_profile(zwtmm, jwt, theta_s, psi_s, bsw, zi)
    hk, dhkdw, smp, dsmpdw = _conductivity_and_potential(
        theta, theta_s, hksat, psi_s, bsw)

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
    dzq = zq[:, 1] - zq[:, 0]
    num = (smp[:, 1] - smp[:, 0]) - dzq
    qout0 = -hk[:, 0] * num / den
    dqodw1 = -(-hk[:, 0] * dsmpdw[:, 0] + num * dhkdw[:, 0]) / den
    dqodw2 = -(hk[:, 0] * dsmpdw[:, 1] + num * dhkdw[:, 0]) / den
    r[0] = qflx_infl - qout0 - qflx_tran_veg * rootr[:, 0]
    a[0] = jnp.zeros_like(qflx_infl)
    b[0] = dz_soil[0] / dt + dqodw1
    cc[0] = dqodw2

    # Interior layers 2..7 (0-based 1..6).
    for i in range(1, nl - 1):
        den_in = zc_soil[i] - zc_soil[i - 1]
        dzq_in = zq[:, i] - zq[:, i - 1]
        num_in = smp[:, i] - smp[:, i - 1] - dzq_in
        qin_i = -hk[:, i - 1] * num_in / den_in
        dqidw0 = -(-hk[:, i - 1] * dsmpdw[:, i - 1]
                   + num_in * dhkdw[:, i - 1]) / den_in
        dqidw1 = -(hk[:, i - 1] * dsmpdw[:, i]
                   + num_in * dhkdw[:, i - 1]) / den_in
        den_out = zc_soil[i + 1] - zc_soil[i]
        dzq_out = zq[:, i + 1] - zq[:, i]
        num_out = (smp[:, i + 1] - smp[:, i]) - dzq_out
        qout_i = -hk[:, i] * num_out / den_out
        dqodw1 = -(-hk[:, i] * dsmpdw[:, i]
                   + num_out * dhkdw[:, i]) / den_out
        dqodw2 = -(hk[:, i] * dsmpdw[:, i + 1]
                   + num_out * dhkdw[:, i]) / den_out
        r[i] = qin_i - qout_i - qflx_tran_veg * rootr[:, i]
        a[i] = -dqidw0
        b[i] = dz_soil[i] / dt - dqidw1 + dqodw1
        cc[i] = dqodw2

    # Bottom soil layer (0-based nl-1) and aquifer layer: two variants
    # selected per cell on water-table position (HYDROLOGY.f90:712-799).
    i = nl - 1
    den_in = zc_soil[i] - zc_soil[i - 1]
    dzq_in = zq[:, i] - zq[:, i - 1]
    num_in = smp[:, i] - smp[:, i - 1] - dzq_in
    qin_bot = -hk[:, i - 1] * num_in / den_in
    dqidw0 = -(-hk[:, i - 1] * dsmpdw[:, i - 1]
               + num_in * dhkdw[:, i - 1]) / den_in
    dqidw1 = -(hk[:, i - 1] * dsmpdw[:, i]
               + num_in * dhkdw[:, i - 1]) / den_in

    # Variant B (table below the column): aquifer coupling.
    s_node_aq = jnp.clip(0.5 * (1.0 + theta[:, i] / theta_s[:, i]),
                         0.01, 1.0)
    smp_aq = jnp.maximum(c.SMPMIN,
                         psi_s[:, i] * s_node_aq ** (-bsw[:, i]))
    dsmpdw_aq = -bsw[:, i] * smp_aq / (s_node_aq * theta_s[:, i])
    den_b = jnp.where(below, zc_aq - zc_soil[i], 1.0)
    dzq_b = zq[:, nl] - zq[:, i]
    num_b = smp_aq - smp[:, i] - dzq_b
    qout_b = -hk[:, i] * num_b / den_b
    dqodw1_b = -(-hk[:, i] * dsmpdw[:, i] + num_b * dhkdw[:, i]) / den_b
    dqodw2_b = -(hk[:, i] * dsmpdw_aq + num_b * dhkdw[:, i]) / den_b

    qout_bot = jnp.where(below, qout_b, 0.0)
    r[i] = qin_bot - qout_bot - qflx_tran_veg * rootr[:, i]
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
    dw = _thomas_solve(a, b, cc, r)
    dwat = jnp.stack(dw[:nl], axis=1)
    h2osoi_new = h2osoi + dwat * dz_soil[None, :nl]

    # --- Aquifer recharge (HYDROLOGY.f90:856-904) -------------------------
    # Table inside the column: Darcy flux between the deepest unsaturated
    # node and the table; below the column: aquifer-layer increment.
    jsafe = jnp.clip(jwt, 0, nl - 1)[:, None]
    th_j = jnp.take_along_axis(theta, jsafe, axis=1)[:, 0]
    ts_j = jnp.take_along_axis(theta_s, jsafe, axis=1)[:, 0]
    hk_j = jnp.take_along_axis(hksat, jsafe, axis=1)[:, 0]
    b_j = jnp.take_along_axis(bsw, jsafe, axis=1)[:, 0]
    s1q = jnp.clip(th_j / ts_j, 0.01, 1.0)
    ka = hk_j * s1q ** (2.0 * b_j + 3.0)
    jm = jnp.clip(jwt - 1, 0, nl - 1)[:, None]
    smp_jm = jnp.take_along_axis(smp, jm, axis=1)[:, 0]
    zq_jm = jnp.take_along_axis(zq[:, :nl], jm, axis=1)[:, 0]
    wh = jnp.maximum(c.SMPMIN, smp_jm) - zq_jm
    zc_jm = jnp.take(zc_soil, jm[:, 0])
    den_q = jnp.where(jwt == 0, zwtmm + 1.0, (zwtmm - zc_jm) * 2.0)
    qcharge_in = jnp.clip(-ka * (0.0 - wh) / den_q, -10.0 / dt, 10.0 / dt)
    qcharge_below = dw[nl] * dz_aq / dt
    qcharge = jnp.where(in_col, qcharge_in, qcharge_below)

    return SoilWaterResult(h2osoi=h2osoi_new, smp=smp, qcharge=qcharge,
                           jwt=jwt, dwat_aq=dw[nl])
