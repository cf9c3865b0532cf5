"""Time-step composition: substep -> day -> forcing block.

TPU-native replacement for the reference driver's loop nest
(SOURCE/HYBRID9.f90:93-332): the NISURF sub-daily loop becomes a
``lax.scan`` over a fused substep kernel, the day loop a ``lax.scan`` over
a forcing block, and the reference's per-cell scalar annual accumulators
(HYBRID9.f90:134-146, 235-253) become ``[n]`` arrays carried through the
scan.  Everything here is jit-compatible and shard-transparent: under a
``NamedSharding`` over the cell axis, XLA partitions the whole scan with
zero compute-phase communication, mirroring the reference's
embarrassingly-parallel domain decomposition (SURVEY.md C14).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .physics import constants as c
from .physics.grow import grow_daily
from .physics.soiltemp import soil_temperature_step
from .physics.hydrology import Geometry, derive_forcing, hydrology_substep
from .state import (AnnualAccumulators, Forcing, ModelState,
                    SoilParams)


def snow_absorptivity(swe: jnp.ndarray, alpha_snow: float = 0.70,
                      swe_half: float = 10.0) -> jnp.ndarray:
    """Per-cell shortwave absorptivity under partial snow cover.

    New capability beyond the reference (which has no snow): blends the
    bare-ground 0.92 absorptivity (HYBRID9.f90:168-174's constant) with
    a snow absorptivity ``1 - alpha_snow`` by the CLM-style fractional
    snow cover ``f = swe / (swe + swe_half)`` — a deep pack reflects
    ~70 % of the shortwave, collapsing Rnet/PAR and with them ET and
    ground heat over snow, the dominant winter radiative feedback.
    """
    fsno = swe / (swe + swe_half)
    return 0.92 * (1.0 - fsno) + (1.0 - alpha_snow) * fsno


def day_step(state: ModelState, forcing: Forcing, params: SoilParams,
             geom: Geometry, dt: float, nisurf: int,
             use_pallas: bool = False, pallas_block: int = 1024,
             routing=None, lateral=None, snow=None, freeze: bool = False,
             vegetation: bool = True, soil_ice: bool = False,
             mesh=None, pallas_interpret: bool = False,
             zd09_every: int = 1, snow_albedo=None,
             carbon: bool = False, focus_idx=None
             ) -> Tuple[ModelState, Dict[str, jnp.ndarray]]:
    """One model day: ``nisurf`` hydrology substeps then daily growth.

    Returns the new state and daily diagnostics (evaporation, runoff, NPP,
    max water-balance residual), the analog of the reference's daily
    accumulation (HYBRID9.f90:193-253).  With ``use_pallas`` the substep
    loop runs as a single VMEM-resident Pallas kernel (pallas_day.py)
    instead of a ``lax.scan`` of XLA-fused substeps; when a ``mesh`` is
    also given, the kernel is ``shard_map``'d over the cell axis so the
    multi-chip production path keeps the Pallas speed (each device runs
    the kernel on its local shard — zero communication, the same per-rank
    = serial compute property as the reference, INIT.f90:271-284).  With
    ``snow`` (a SnowParams), the daily snowpack (physics/snow.py)
    reshapes the precipitation input: snowfall accumulates as SWE and
    melt is released as effective rainfall.
    """
    swe = state.swe
    snowpack = state.snowpack
    snow_capped = None
    # Snow-albedo feedback: shortwave absorptivity from the day-start
    # pack (snow on the ground during the day reflects SW, collapsing
    # Rnet/PAR/ET).  ``snow_albedo`` is (alpha_snow, swe_half) or None.
    sw_abs = None
    if snow is not None and snow_albedo is not None:
        sw_abs = snow_absorptivity(state.swe, *snow_albedo)
    if snow is not None:
        from .physics.snow import (TwoLayerSnowParams, snow_step,
                                   snow_step_two_layer)
        if isinstance(snow, TwoLayerSnowParams):
            # state.swe is the authoritative water store across scheme
            # switches (it mirrors the pack total while this scheme
            # runs): reconcile the pack to it so resuming a degree-day
            # checkpoint under "twolayer" banks the legacy SWE in the
            # base layer instead of deleting it, and a shrunken swe
            # cannot resurrect stale pack water.  When the scheme ran
            # last day, total == swe exactly and this is a no-op.
            total = (snowpack.swe_surf + snowpack.swe_base
                     + snowpack.w_liq)
            scale = jnp.where(total > 0.0,
                              swe / jnp.maximum(total, 1.0e-12), 0.0)
            snowpack = snowpack.replace(
                swe_surf=snowpack.swe_surf * scale,
                swe_base=snowpack.swe_base * scale
                + jnp.where(total > 0.0, 0.0, swe),
                w_liq=snowpack.w_liq * scale)
            snowpack, pr_eff, _melt, snow_capped = snow_step_two_layer(
                snowpack, forcing.tas, forcing.pr, snow)
            # swe mirrors the pack total so accumulators/output are
            # scheme-agnostic.
            swe = snowpack.swe_surf + snowpack.swe_base + snowpack.w_liq
        else:
            swe, pr_eff, _melt, snow_capped = snow_step(
                swe, forcing.tas, forcing.pr, snow)
        forcing = forcing.replace(pr=pr_eff)
    # Frozen-soil impedance, lagged like smp and constant across the
    # day's substeps: from the prognostic ice store when it is on,
    # else from yesterday's temperature column (ramp proxy).
    imp = None
    if freeze:
        if soil_ice:
            from .physics.soiltemp import freeze_impedance_from_ice
            imp = freeze_impedance_from_ice(state.soil.h2osoi_liq,
                                            state.h2osoi_ice)
        else:
            from .physics.soiltemp import freeze_impedance
            imp = freeze_impedance(state.t_soil)

    if use_pallas:
        if mesh is not None:
            from .physics.pallas_day import pallas_hydrology_day_sharded
            soil, pd = pallas_hydrology_day_sharded(
                state.soil, state.veg, params, forcing, geom, dt, nisurf,
                mesh=mesh, axis=mesh.axis_names[0], block=pallas_block,
                interpret=pallas_interpret, imp=imp,
                zd09_every=zd09_every, sw_abs=sw_abs)
        else:
            from .physics.pallas_day import pallas_hydrology_day
            soil, pd = pallas_hydrology_day(
                state.soil, state.veg, params, forcing, geom, dt, nisurf,
                block=pallas_block, interpret=pallas_interpret, imp=imp,
                zd09_every=zd09_every, sw_abs=sw_abs)
        veg, npp, litterfall, vflux = _grow(state.veg, soil, forcing,
                                            geom, vegetation)
        diags = dict(evap_day=pd["evap_day"],
                     evap_grnd_day=pd["evap_grnd_day"],
                     rnf_day=pd["rnf_day"],
                     max_abs_residual=pd["max_abs_residual"],
                     npp=npp, **vflux)
        if focus_idx is not None:
            # One-cell XLA shadow scan: keeps the per-substep focus
            # water-table trace (HYDROLOGY.f90:509) on the Pallas
            # production path.
            diags["wt_substeps"] = _focus_shadow_wt(
                state, params, forcing, geom, dt, nisurf, imp,
                zd09_every, sw_abs, focus_idx)
        if snow_capped is not None:    # capped-pack ice runoff (mm)
            diags["rnf_day"] = diags["rnf_day"] + snow_capped
        river, diags = _route(state.river_store, diags, routing)
        soil = _lateral(soil, lateral)
        t_soil, soil, ice = _soil_thermal(state, soil, params, forcing,
                                          geom, soil_ice, sw_abs)
        cstate, rh, nee, cflux = _carbon(state.carbon, vflux, litterfall,
                                         t_soil, soil, params, geom,
                                         carbon)
        diags["rh"] = rh
        diags["nee"] = nee
        diags.update(cflux)
        return ModelState(soil=soil, veg=veg, river_store=river,
                          t_soil=t_soil, swe=swe, h2osoi_ice=ice,
                          snowpack=snowpack, carbon=cstate), diags

    soil, evap_day, evap_grnd_day, rnf_day, max_res, wt_trace = \
        _xla_day_substeps(state.soil, state.veg, params, forcing, geom,
                          dt, nisurf, imp, zd09_every, sw_abs, focus_idx)
    veg = state.veg

    veg, npp, litterfall, vflux = _grow(veg, soil, forcing, geom,
                                        vegetation)

    diags = dict(
        evap_day=evap_day,
        evap_grnd_day=evap_grnd_day,
        rnf_day=rnf_day,
        max_abs_residual=max_res,
        npp=npp,
        **vflux,
    )
    if wt_trace is not None:
        # Per-substep water-table trace of the focus cell, the analog of
        # the reference's unit-98 INTERACTIVE dump (HYDROLOGY.f90:509).
        diags["wt_substeps"] = wt_trace
    if snow_capped is not None:        # capped-pack ice runoff (mm)
        diags["rnf_day"] = diags["rnf_day"] + snow_capped
    river, diags = _route(state.river_store, diags, routing)
    soil = _lateral(soil, lateral)
    t_soil, soil, ice = _soil_thermal(state, soil, params, forcing,
                                      geom, soil_ice, sw_abs)
    cstate, rh, nee, cflux = _carbon(state.carbon, vflux, litterfall,
                                     t_soil, soil, params, geom, carbon)
    diags["rh"] = rh
    diags["nee"] = nee
    diags.update(cflux)
    return ModelState(soil=soil, veg=veg, river_store=river,
                      t_soil=t_soil, swe=swe, h2osoi_ice=ice,
                      snowpack=snowpack, carbon=cstate), diags


def _xla_day_substeps(soil0, veg, params, forcing, geom, dt,
                      nisurf: int, imp, zd09_every: int, sw_abs,
                      focus_idx):
    """The XLA substep loop: ``nisurf`` fused hydrology substeps.

    Shared by the XLA day path (full batch) and the Pallas branch's
    one-cell focus shadow (``_focus_shadow_wt``).  Returns
    ``(soil, evap_day, evap_grnd_day, rnf_day, max_res, wt_trace)``
    with the daily sums riding the scan carry (not stacked ys): less
    HBM traffic and a smaller XLA graph than materialising
    ``[nisurf, n]`` flux arrays.
    """
    fd = derive_forcing(forcing, sw_abs)
    n = forcing.tas.shape[0]
    dtype = forcing.tas.dtype
    zeros = jnp.zeros((n,), dtype)
    # Forcing/LAI-only ET terms hoisted out of the 48-substep loop
    # (bitwise-neutral; et.daily_et_context).
    from .physics.et import daily_et_context
    et_ctx = daily_et_context(fd, veg.lai)

    if zd09_every > 1:
        # Refresh the ZD09 equilibrium profile AND the drainage
        # specific-yield profile only every zd09_every substeps (see
        # soilwater.compute_equilibrium_zq and
        # drainage.compute_specific_yields); both ride the carry as
        # stacked [n, nl+1] / [n, nl] arrays.
        from .physics.drainage import compute_specific_yields
        from .physics.layers import stack, unstack
        from .physics.soilwater import compute_equilibrium_zq

        def fresh_ctx(zwt):
            # geom.zi stays a tuple of (weak-typed) Python floats, so the
            # profile keeps the state dtype.
            zq = stack(compute_equilibrium_zq(
                zwt, unstack(params.theta_s), unstack(params.psi_s),
                unstack(params.bsw), geom.zi))
            sy = stack(compute_specific_yields(
                zwt, unstack(params.theta_s), unstack(params.psi_s),
                unstack(params.bsw)))
            return zq, sy

        def substep(carry, it):
            soil, zq, sy, evap, evap_grnd, rnf, max_res = carry
            zq, sy = jax.lax.cond(it % zd09_every == 0, fresh_ctx,
                                  lambda _: (zq, sy), soil.zwt)
            soil, fx = hydrology_substep(soil, veg, params, fd, geom,
                                         dt, imp=imp, zq=zq,
                                         et_ctx=et_ctx, sy=sy)
            evap = evap + (fx.qflx_evap_grnd + fx.qflx_tran_veg) * dt
            evap_grnd = evap_grnd + fx.qflx_evap_grnd * dt
            rnf = rnf + (fx.qflx_surf + fx.rsub_top) * dt
            max_res = jnp.maximum(max_res, jnp.abs(fx.residual))
            ys = soil.zwt[focus_idx] if focus_idx is not None else None
            return (soil, zq, sy, evap, evap_grnd, rnf, max_res), ys

        nl = soil0.h2osoi_liq.shape[1]
        zq0 = jnp.zeros((n, nl + 1), dtype)
        sy0 = jnp.zeros((n, nl), dtype)
        carry0 = (soil0, zq0, sy0, zeros, zeros, zeros, zeros)
        (soil, _zq, _sy, evap_day, evap_grnd_day, rnf_day, max_res), \
            wt_trace = jax.lax.scan(substep, carry0, jnp.arange(nisurf))
    else:
        def substep(carry, _):
            soil, evap, evap_grnd, rnf, max_res = carry
            soil, fx = hydrology_substep(soil, veg, params, fd, geom,
                                         dt, imp=imp, et_ctx=et_ctx)
            evap = evap + (fx.qflx_evap_grnd + fx.qflx_tran_veg) * dt
            evap_grnd = evap_grnd + fx.qflx_evap_grnd * dt
            rnf = rnf + (fx.qflx_surf + fx.rsub_top) * dt
            max_res = jnp.maximum(max_res, jnp.abs(fx.residual))
            ys = soil.zwt[focus_idx] if focus_idx is not None else None
            return (soil, evap, evap_grnd, rnf, max_res), ys

        carry0 = (soil0, zeros, zeros, zeros, zeros)
        (soil, evap_day, evap_grnd_day, rnf_day, max_res), wt_trace = \
            jax.lax.scan(substep, carry0, None, length=nisurf)
    return soil, evap_day, evap_grnd_day, rnf_day, max_res, wt_trace


def _focus_shadow_wt(state: ModelState, params, forcing, geom, dt,
                     nisurf: int, imp, zd09_every: int, sw_abs,
                     focus_idx: int) -> jnp.ndarray:
    """Per-substep water-table trace of the focus cell on the Pallas
    path (VERDICT r3 item 5): a one-cell XLA shadow of the day's
    substep loop, started from the same day-start state and forcing
    the Pallas kernel consumes, with the same ZD09 refresh cadence —
    so INTERACTIVE runs on TPU keep the reference's unit-98 artifact
    (HYDROLOGY.f90:509).  Costs one cell x nisurf substeps per day
    (negligible next to the [n]-cell kernel); the trace agrees with
    the kernel's own trajectory to the Pallas-vs-XLA parity tolerance
    (tests/test_pallas_day.py).

    Returns the ``[nisurf]`` zwt trace.
    """
    def sl(x):
        return (x[focus_idx:focus_idx + 1]
                if hasattr(x, "ndim") and x.ndim >= 1 else x)

    soil1 = jax.tree_util.tree_map(sl, state.soil)
    veg1 = jax.tree_util.tree_map(sl, state.veg)
    p1 = jax.tree_util.tree_map(sl, params)
    f1 = jax.tree_util.tree_map(sl, forcing)
    imp1 = sl(imp) if imp is not None else None
    sw1 = sl(sw_abs) if sw_abs is not None else None
    *_rest, wt_trace = _xla_day_substeps(soil1, veg1, p1, f1, geom, dt,
                                         nisurf, imp1, zd09_every, sw1,
                                         focus_idx=0)
    return wt_trace


def _grow(veg, soil, forcing, geom, vegetation: bool):
    """Daily vegetation update, or a no-op in hydrology-only mode
    (BASELINE.json config 2: global hydrology without vegetation —
    LAI/roots stay at their prescribed initial values).  Returns
    ``(veg, npp, litterfall, fluxes)``; the flux dict feeds the
    equilibrium spin-up (spinup.py) and is XLA-eliminated otherwise."""
    if vegetation:
        return grow_daily(veg, soil.smp, forcing.tas, geom.zi,
                          return_fluxes=True)
    z = jnp.zeros_like(veg.lai)
    return veg, z, z, {}


def _carbon(carbon_state, vflux, litterfall, t_soil, soil, params, geom,
            enabled: bool):
    """Daily soil-carbon cascade (physics/carbon.py), or a no-op.

    Runs on the END-of-day soil temperature and moisture (the same
    lagged-coupling convention as GROW's smp input, GROW.f90:57).
    NEE uses the realized plant production from the growth flux record
    (``vflux["v_production"]``) so ecosystem carbon is conserved (see
    carbon_daily).  Returns ``(carbon', rh, nee, fluxes)``; the flux
    dict feeds the equilibrium spin-up's per-pool turnover accumulators
    (spinup.py) and is dead code (XLA-eliminated) in ordinary runs.
    """
    if not enabled:
        z = jnp.zeros_like(litterfall)
        return carbon_state, z, z, {}
    from .physics.carbon import carbon_daily
    dz = jnp.asarray(geom.dz_soil, soil.h2osoi_liq.dtype)
    theta = soil.h2osoi_liq / (dz[None, :] * c.RHOW / 1.0e3)
    production = (vflux["v_production"] if vflux
                  else jnp.zeros_like(litterfall))
    return carbon_daily(carbon_state, production, litterfall, t_soil,
                        theta, params.theta_s, return_fluxes=True)


def _lateral(soil, lateral):
    """Daily halo-exchange groundwater redistribution
    (physics/lateral.py), applied to the aquifer store."""
    if lateral is None:
        return soil
    from .physics.lateral import lateral_groundwater_step
    wa_new, _ = lateral_groundwater_step(soil.wa, soil.zwt, lateral)
    return soil.replace(wa=wa_new)


def _soil_thermal(state, soil_new, params, forcing, geom,
                  soil_ice: bool, sw_abs=None):
    """Daily implicit soil-heat step driven by the SW85 ground heat flux
    G = 0.2 * Rnet * exp(-0.7 * LAI) (HYDROLOGY.f90:335-339), using the
    LAI in effect during the day's substeps, plus an implicit sensible
    exchange h * (tas - T_1) through the SW85 aerodynamic resistance raa
    (HYDROLOGY.f90:312-318), which anchors the column to the atmosphere
    so the long-term surface energy balance closes.

    With ``soil_ice`` the solve runs with plain heat capacity and the
    explicit phase-change step (physics/soiltemp.py) exchanges sensible
    heat for ice mass afterwards; otherwise freeze/thaw latent heat is
    approximated in-solve by the apparent-capacity band.  Returns
    ``(t_soil, soil, h2osoi_ice)``.
    """
    lai = state.veg.lai
    a = 0.92 if sw_abs is None else sw_abs
    rnet = (a * forcing.rsds + forcing.rlds
            - c.STBO * forcing.tas ** 4)
    g_flux = 0.2 * rnet * jnp.exp(-0.7 * lai)
    raa = jnp.where(lai <= 4.0,
                    0.25 * lai * 42.0 + 0.25 * (4.0 - lai) * 34.0, 42.0)
    rho_air = forcing.ps / (c.RGAS * forcing.tas)
    h_surf = rho_air * c.CP_AIR / jnp.maximum(raa, 1.0)
    dz = jnp.asarray(geom.dz_soil, soil_new.h2osoi_liq.dtype)
    water = soil_new.h2osoi_liq
    if soil_ice:
        water = water + state.h2osoi_ice   # ice conducts/stores heat too
    theta = water / (dz[None, :] * c.RHOW / 1.0e3)
    t_soil = soil_temperature_step(
        state.t_soil, theta, params.theta_s, g_flux, geom.dz_soil,
        geom.zc_soil, c.SDAY, t_air=forcing.tas, h_surf=h_surf,
        latent_ramp=0.0 if soil_ice else 2.0)
    if not soil_ice:
        return t_soil, soil_new, state.h2osoi_ice
    from .physics.soiltemp import phase_change
    t_soil, liq, ice = phase_change(t_soil, soil_new.h2osoi_liq,
                                    state.h2osoi_ice, params.theta_s,
                                    geom.dz_soil)
    return t_soil, soil_new.replace(h2osoi_liq=liq), ice


def _route(river_store, diags, routing):
    """Daily lateral routing of the day's runoff (physics/routing.py):
    a daily linear reservoir (RoutingParams), sub-daily kinematic wave
    (KinematicParams) or Muskingum-Cunge (MuskingumParams), dispatched
    on the params type."""
    if routing is None:
        diags = dict(diags, discharge=jnp.zeros_like(river_store))
        return river_store, diags
    from .physics.routing import (GridRouting, KinematicParams,
                                  MuskingumParams, route_daily,
                                  route_grid_day, route_kinematic_day,
                                  route_muskingum_day)
    if isinstance(routing, GridRouting):
        route = route_grid_day
    elif isinstance(routing, MuskingumParams):
        route = route_muskingum_day
    elif isinstance(routing, KinematicParams):
        route = route_kinematic_day
    else:
        route = route_daily
    new_store, discharge = route(river_store, diags["rnf_day"], routing)
    return new_store, dict(diags, discharge=discharge)


def _accumulate(acc: AnnualAccumulators, state: ModelState,
                forcing: Forcing, diags: Dict[str, jnp.ndarray],
                dz_soil) -> AnnualAccumulators:
    """Daily accumulation into annual sums (HYBRID9.f90:235-253)."""
    dz = jnp.asarray(dz_soil, state.soil.h2osoi_liq.dtype)
    theta = state.soil.h2osoi_liq / (dz[None, :] * c.RHOW / 1.0e3)
    return acc.replace(
        npp_sum=acc.npp_sum + diags["npp"],
        discharge_sum=acc.discharge_sum + diags["discharge"],
        t_surf_sum=acc.t_surf_sum + state.t_soil[:, 0],
        plant_mass_sum=acc.plant_mass_sum + state.veg.plant_mass,
        rnf_sum=acc.rnf_sum + diags["rnf_day"],
        evap_sum=acc.evap_sum + diags["evap_day"],
        tas_sum=acc.tas_sum + forcing.tas,
        rlds_sum=acc.rlds_sum + forcing.rlds,
        rsds_sum=acc.rsds_sum + forcing.rsds,
        huss_sum=acc.huss_sum + forcing.huss,
        ps_sum=acc.ps_sum + forcing.ps,
        pr_sum=acc.pr_sum + forcing.pr,
        rhs_sum=acc.rhs_sum + forcing.rhs,
        theta_sum=acc.theta_sum + theta,
        h2osoi_total_sum=acc.h2osoi_total_sum
        + jnp.sum(state.soil.h2osoi_liq, axis=-1),
        swe_sum=acc.swe_sum + state.swe,
        ice_sum=acc.ice_sum + jnp.sum(state.h2osoi_ice, axis=-1),
        rh_sum=acc.rh_sum + diags["rh"],
        nee_sum=acc.nee_sum + diags["nee"],
        c_soil_sum=acc.c_soil_sum + state.carbon.c_litter
        + state.carbon.c_soil_fast + state.carbon.c_soil_slow,
        n_days=acc.n_days + 1.0,
        max_abs_residual=jnp.maximum(acc.max_abs_residual,
                                     diags["max_abs_residual"]),
    )


def _focus_row(state: ModelState, forcing: Forcing,
               diags: Dict[str, jnp.ndarray], dz_soil,
               idx: int) -> Dict[str, jnp.ndarray]:
    """Daily diagnostic scalars for one focus cell — the analog of the
    reference's INTERACTIVE per-day CSV line (HYBRID9.f90:221-229,
    header INIT.f90:887-891) and water-table trace (HYDROLOGY.f90:509)."""
    dz_sum = float(sum(dz_soil))
    h_tot = jnp.sum(state.soil.h2osoi_liq[idx])
    extra = ({"wt_substeps": diags["wt_substeps"]}
             if "wt_substeps" in diags else {})
    return dict(
        **extra,
        tas=forcing.tas[idx], pr=forcing.pr[idx], rsds=forcing.rsds[idx],
        evap=diags["evap_day"][idx], evap_grnd=diags["evap_grnd_day"][idx],
        rnf=diags["rnf_day"][idx], discharge=diags["discharge"][idx],
        npp=diags["npp"][idx], rh=diags["rh"][idx],
        nee=diags["nee"][idx], zwt=state.soil.zwt[idx],
        wa=state.soil.wa[idx], lai=state.veg.lai[idx],
        plant_mass=state.veg.plant_mass[idx],
        theta_mean=h_tot / (dz_sum * c.RHOW / 1.0e3),
        t_surf=state.t_soil[idx, 0],
        swe=state.swe[idx],
        residual=diags["max_abs_residual"][idx],
    )


_BLOCK_STEP_STATIC = ("nisurf", "dt", "geom", "use_pallas",
                      "pallas_block", "focus_idx", "freeze", "vegetation",
                      "soil_ice", "mesh", "pallas_interpret", "zd09_every",
                      "snow_albedo", "carbon")


def _block_step(state: ModelState, acc: AnnualAccumulators,
               forcing_block: Forcing, params: SoilParams, geom: Geometry,
               dt: float, nisurf: int, use_pallas: bool = False,
               pallas_block: int = 1024, routing=None, lateral=None,
               snow=None, focus_idx=None, freeze: bool = False,
               vegetation: bool = True, soil_ice: bool = False,
               mesh=None, pallas_interpret: bool = False,
               zd09_every: int = 1, snow_albedo=None,
               carbon: bool = False):
    """Scan the day step over a ``[days, n]`` forcing block.

    This is the unit of compiled work: the host feeds one forcing block at
    a time (month/year), keeping HBM bounded, and the whole block runs as
    a single XLA computation — the reference's decade-resident forcing
    (HYBRID9.f90:93-97) re-chunked for accelerator memory.

    Returns ``(state, acc)``, plus a third element of stacked ``[days]``
    focus-cell diagnostics when ``focus_idx`` is set (INTERACTIVE mode).
    """

    def body(carry, f_day):
        st, ac = carry
        st, diags = day_step(st, f_day, params, geom, dt, nisurf,
                             use_pallas=use_pallas,
                             pallas_block=pallas_block, routing=routing,
                             lateral=lateral, snow=snow, freeze=freeze,
                             vegetation=vegetation, soil_ice=soil_ice,
                             mesh=mesh, pallas_interpret=pallas_interpret,
                             zd09_every=zd09_every,
                             snow_albedo=snow_albedo, carbon=carbon,
                             focus_idx=focus_idx)
        ac = _accumulate(ac, st, f_day, diags, geom.dz_soil)
        ys = (_focus_row(st, f_day, diags, geom.dz_soil, focus_idx)
              if focus_idx is not None else None)
        return (st, ac), ys

    (state, acc), ys = jax.lax.scan(body, (state, acc), forcing_block)
    if focus_idx is not None:
        return state, acc, ys
    return state, acc


#: Default compiled block step (no donation — the axon TPU backend fails
#: D2H transfers of outputs from donated-input executables,
#: InvalidArgument; Config.donate_state documents the trade).
block_step = jax.jit(_block_step, static_argnames=_BLOCK_STEP_STATIC)

#: Donating variant (Config.donate_state=True): the incoming state and
#: accumulator buffers are reused for the outputs, saving one state-sized
#: HBM copy per block.  Callers must not touch the donated pytrees after
#: the call (run.py rebinds both from the return value).
block_step_donated = jax.jit(_block_step, donate_argnums=(0, 1),
                             static_argnames=_BLOCK_STEP_STATIC)


def annual_means(acc: AnnualAccumulators, nisurf: int
                 ) -> Dict[str, jnp.ndarray]:
    """Finalize annual-mean diagnostics (HYBRID9.f90:263-291).

    Matches the reference's normalisations: npp is an annual sum; rnf and
    evap are mean mm/s over substeps; state variables are daily means.
    """
    nt = acc.n_days
    return dict(
        npp=acc.npp_sum,
        discharge=acc.discharge_sum,
        t_surface=acc.t_surf_sum / nt,
        plant_mass=acc.plant_mass_sum / nt,
        rnf=acc.rnf_sum / (nt * nisurf * (c.SDAY / nisurf)),
        evap=acc.evap_sum / (nt * nisurf * (c.SDAY / nisurf)),
        tas=acc.tas_sum / nt,
        rlds=acc.rlds_sum / nt,
        rsds=acc.rsds_sum / nt,
        huss=acc.huss_sum / nt,
        ps=acc.ps_sum / nt,
        pr=acc.pr_sum / nt,
        rhs=acc.rhs_sum / nt,
        theta=acc.theta_sum / nt,
        theta_total=acc.h2osoi_total_sum / nt,
        swe=acc.swe_sum / nt,
        soil_ice=acc.ice_sum / nt,
        rh=acc.rh_sum,               # annual sums, like npp
        nee=acc.nee_sum,
        c_soil=acc.c_soil_sum / nt,  # annual-mean store
        max_abs_residual=acc.max_abs_residual,
    )
