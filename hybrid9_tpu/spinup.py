"""Carbon equilibrium spin-up: semi-analytic repeat-climate loop.

The soil-carbon pools (state.CarbonState) initialise at fixed
mid-latitude values, so NEE is transient for decades of simulation —
the slow pool's 100-year turnover means a cold-started run reports a
spurious carbon source or sink for its entire length.  The reference
has no carbon pools at all (its carbon stops at the plant mass,
SURVEY.md C15), so this subsystem needs its own equilibration utility.

The method is the standard semi-analytic spin-up (the CENTURY-family
accelerator, cf. Xia et al. 2012 GMD): because every decomposition flux
is *linear in its pool* for a given modifier series (physics/carbon.py:
``d_pool = pool * min(k * mod, 1)``), the periodic steady state under a
repeated climate year can be solved pool-by-pool from one rehearsal
year's integrated fluxes:

    pool* = pool_end * (annual input to pool) / (annual output of pool)

applied in cascade order (litter -> fast -> slow, each target input
evaluated at the upstream pool's own steady state, where the upstream
annual throughput equals its annual input).  A few rehearsal years
iterate out the nonlinearity that remains (the within-year pool
trajectory shape, and vegetation still drifting toward its own
equilibrium); convergence is checked on the slow pool — the binding
timescale — and on annual NEE.

Vegetation and hydrology integrate normally during the rehearsal years
(they equilibrate on their own fast timescales), so the spin-up doubles
as a general model spin-up under the repeated climate.

TPU-native: each rehearsal year is the production ``day_step`` scanned
over forcing blocks (same Pallas/sharding configuration as the run it
precedes, via ``Simulation.step_kwargs``); the flux accumulators ride
the scan carry as ``[n]`` arrays, and the ratio update is elementwise,
so everything shards over the cell axis unchanged.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import calendar
from .physics.carbon import RESP_FAST, TO_FAST, TO_SLOW
from .step import day_step
from .utils.logging import get_logger

log = get_logger(__name__)

#: Annual flux below which a pool's in/out ratio is degenerate
#: (g C/m^2/yr).  No-throughput pools (outflow ~ 0 too) are left
#: untouched; pools that decay without input (deserts, permafrost:
#: outflow > 0, inflow ~ 0) jump straight to their true steady state
#: of zero — otherwise the cold-start stock decays a sliver per
#: rehearsal year and pins max|d slow| above any tolerance forever.
_FLUX_FLOOR = 1.0e-6

_SPIN_STATIC = ("nisurf", "dt", "geom", "use_pallas", "pallas_block",
                "freeze", "vegetation", "soil_ice", "mesh",
                "pallas_interpret", "zd09_every", "snow_albedo", "carbon")

#: Accumulator name -> the day_step diagnostic it integrates.
_DIAG_KEY = dict(
    lit_in="c_lit_in", d_lit="c_d_lit", d_fast="c_d_fast",
    d_slow="c_d_slow", nee="nee", npp="npp",
    grow_pm="v_grow_pm", loss_pm="v_loss_pm",
    grow_fm="v_grow_fm", loss_fm="v_loss_fm")


@functools.partial(jax.jit, static_argnames=_SPIN_STATIC)
def _spinup_block(state, sums, forcing_block, params, geom, dt, nisurf,
                  use_pallas=False, pallas_block=1024, routing=None,
                  lateral=None, snow=None, freeze=False, vegetation=True,
                  soil_ice=False, mesh=None, pallas_interpret=False,
                  zd09_every=1, snow_albedo=None, carbon=True):
    """Scan the production day step over a forcing block, accumulating
    the carbon-cycle turnover record (``sums``: per-cell annual sums of
    litter C input, decomposed flux per pool, NEE and NPP)."""

    def body(carry, f_day):
        st, s = carry
        st, diags = day_step(st, f_day, params, geom, dt, nisurf,
                             use_pallas=use_pallas,
                             pallas_block=pallas_block, routing=routing,
                             lateral=lateral, snow=snow, freeze=freeze,
                             vegetation=vegetation, soil_ice=soil_ice,
                             mesh=mesh, pallas_interpret=pallas_interpret,
                             zd09_every=zd09_every,
                             snow_albedo=snow_albedo, carbon=carbon)
        s = {k: s[k] + diags[_DIAG_KEY[k]] for k in s}
        return (st, s), None

    (state, sums), _ = jax.lax.scan(body, (state, sums), forcing_block)
    return state, sums


def _jump(pool, inflow, outflow, damping: float = 1.0):
    """Scale ``pool`` by (in/out)**damping.  damping=1 is the exact
    linear-pool fixed point; damping<1 is a log-space relaxation for
    pools whose jump feeds back on the forcing (vegetation -> LAI ->
    ET -> soil moisture -> growth), where the undamped iteration can
    enter a period-2 limit cycle."""
    ok = (outflow > _FLUX_FLOOR) & (inflow > _FLUX_FLOOR)
    dead = (outflow > _FLUX_FLOOR) & ~(inflow > _FLUX_FLOOR)
    ratio = inflow / jnp.maximum(outflow, _FLUX_FLOOR)
    if damping != 1.0:
        ratio = ratio ** damping
    return jnp.where(ok, pool * ratio,
                     jnp.where(dead, jnp.zeros_like(pool), pool))


@functools.partial(jax.jit, static_argnames=("spin_vegetation",))
def _ratio_update(state, sums, spin_vegetation=True):
    """Jump each pool to its implied periodic steady state.

    Fluxes are linear in the pools, so scaling a pool by (annual in /
    annual out) lands it on the balance point for the rehearsed modifier
    series.  The cascade targets use the *steady-state* upstream
    throughput: at equilibrium the litter pool turns over exactly its
    input, so fast's target input is ``TO_FAST * lit_in`` (not the
    transient ``TO_FAST * d_lit``), and similarly for slow.

    With ``spin_vegetation`` the plant pools jump too: daily growth is
    mass-independent (GROW.f90:90-91 — potential growth per plant) while
    maintenance and foliage turnover are proportional losses
    (GROW.f90:120-146), so the same accelerator applies; LAI scales with
    the foliage pool (its initialisation relation, INIT.f90:781).
    Without it NEE converges to the litterfall/NPP imbalance of the
    still-drifting plant pool instead of ~0.
    """
    carbon = state.carbon
    lit_in = sums["lit_in"]
    fast_in = TO_FAST * lit_in
    slow_in = (TO_SLOW + (1.0 - RESP_FAST) * TO_FAST) * lit_in
    carbon = carbon.replace(
        c_litter=_jump(carbon.c_litter, lit_in, sums["d_lit"]),
        c_soil_fast=_jump(carbon.c_soil_fast, fast_in, sums["d_fast"]),
        c_soil_slow=_jump(carbon.c_soil_slow, slow_in, sums["d_slow"]))
    if not spin_vegetation:
        return state.replace(carbon=carbon)
    veg = state.veg
    foliage = _jump(veg.plant_foliage_mass, sums["grow_fm"],
                    sums["loss_fm"], damping=0.5)
    f_ratio = foliage / jnp.maximum(veg.plant_foliage_mass, 1.0e-12)
    veg = veg.replace(
        plant_mass=_jump(veg.plant_mass, sums["grow_pm"],
                         sums["loss_pm"], damping=0.5),
        plant_foliage_mass=foliage,
        lai=jnp.maximum(0.001, veg.lai * f_ratio))
    return state.replace(carbon=carbon, veg=veg)


def spinup_carbon(sim, forcing_provider, year: Optional[int] = None,
                  max_loops: int = 8, tol_slow: float = 1.0,
                  block_days: Optional[int] = None,
                  spin_vegetation: bool = True) -> Dict[str, float]:
    """Equilibrate the carbon pools under a repeated climate year.

    Args:
      sim: a ``run.Simulation`` (its state is advanced in place; the
        physics configuration — Pallas, sharding, snow, routing — is
        exactly the production one).
      forcing_provider: same contract as ``Simulation.run_year``.
      year: climate year to repeat (default ``cfg.start_year``).
      max_loops: rehearsal-year budget.
      tol_slow: convergence threshold on the slow pool's drift over one
        rehearsal year, max over cells, g C/m^2/yr.  The slow pool is
        the binding timescale; litter/fast converge strictly faster.
      block_days: forcing block length (default ``cfg`` setting).
      spin_vegetation: also jump the plant pools to their periodic
        steady state each loop (see ``_ratio_update``); required for
        annual NEE to converge to ~0 rather than to the plant pool's
        residual drift.

    Returns a report dict: loops used, final max |d slow|/yr, final
    domain-mean annual NEE (g C/m^2/yr), and the domain-mean pools.
    """
    cfg = sim.cfg
    if not (cfg.carbon and cfg.vegetation):
        raise ValueError("carbon spin-up needs Config.carbon and "
                         "Config.vegetation enabled")
    year = int(year if year is not None else cfg.start_year)
    ndays = calendar.days_in_year(year)
    block_days = block_days or cfg.forcing_block_days
    kw = sim.step_kwargs()
    dtype = sim.dtype

    def zeros():
        s = {k: jnp.zeros((sim.n,), dtype) for k in _DIAG_KEY}
        return sim.sharding.put(s) if sim.sharding is not None else s

    def local(arr):
        """This host's slab (multi-host) or the whole array."""
        if sim.sharding is not None and jax.process_count() > 1:
            return sim.sharding.host_local(arr)
        return np.asarray(arr)

    n_land_local = sim._local_land_count()
    report: Dict[str, float] = {}
    drift = float("inf")
    loops = 0
    for loop in range(max_loops):
        slow0 = sim.state.carbon.c_soil_slow
        sums = zeros()
        doy = 1
        state = sim.state
        while doy <= ndays:
            nblk = min(block_days, ndays - doy + 1)
            block = forcing_provider(year, doy, nblk)
            state, sums = _spinup_block(state, sums, block, sim.params,
                                        sim.geom, cfg.dt, cfg.nisurf,
                                        **kw)
            doy += nblk
        # Drift over the rehearsal year BEFORE the jump: the convergence
        # measure is how far from periodic the un-accelerated dynamics
        # already are.
        d_slow = local(state.carbon.c_soil_slow - slow0)[:n_land_local]
        drift = float(np.max(np.abs(d_slow))) if d_slow.size else 0.0
        nee = local(sums["nee"])[:n_land_local]
        mean_nee = float(np.mean(nee)) if nee.size else 0.0
        loops = loop + 1
        log.info("carbon spin-up year %d/%d: max|d slow| %.3g g C/m^2/yr"
                 ", mean NEE %.3g", loops, max_loops, drift, mean_nee)
        sim.state = _ratio_update(state, sums,
                                  spin_vegetation=spin_vegetation)
        report = dict(loops=loops, max_dslow=drift, mean_nee=mean_nee)
        if drift < tol_slow:
            break
    for k, field in (("mean_litter", "c_litter"),
                     ("mean_fast", "c_soil_fast"),
                     ("mean_slow", "c_soil_slow")):
        v = local(getattr(sim.state.carbon, field))[:n_land_local]
        report[k] = float(np.mean(v)) if v.size else 0.0
    if drift >= tol_slow:
        log.warning("carbon spin-up did not converge in %d years "
                    "(max|d slow| %.3g > %.3g)", loops, drift, tol_slow)
    return report
