"""Model state pytrees.

TPU-native replacement for the reference's global shared-state module
(reference: SOURCE/SHARED.f90) — instead of module-level mutable arrays
indexed by the current cell ``(x, y)``, all state lives in immutable, typed
pytrees with a packed leading cell axis ``[n]`` (land cells only, gathered
once at init; see grids/grid.py), HBM-resident and shardable with
``jax.sharding.NamedSharding`` along that axis.

Shapes: ``[n]`` per-cell scalars, ``[n, 8]`` per-cell-per-soil-layer,
``[n, 9]`` where the virtual aquifer layer is included.  Units follow the
reference exactly (mm, mm/s, K, W/m^2, g, m^2/m^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .physics import constants as c


@struct.dataclass
class SoilParams:
    """Static per-cell soil properties.

    Reference fields: SHARED.f90:398-430 (theta_s, hksat, lambda, bsw,
    psi_s, theta_m stacks) and Fmax (SHARED.f90:445-449, read at
    INIT.f90:652-680).
    """

    theta_s: jax.Array    # [n, 8] Saturated vol. water content (mm^3/mm^3)
    hksat: jax.Array      # [n, 8] Saturated hydraulic conductivity  (mm/s)
    lambda_: jax.Array    # [n, 8] Pore-size distribution index         (-)
    bsw: jax.Array        # [n, 8] Clapp-Hornberger b = 1/lambda        (-)
    psi_s: jax.Array      # [n, 8] Saturated matric potential          (mm)
    theta_m: jax.Array    # [n, 8] Residual water content at -31 bar    (-)
    fmax: jax.Array       # [n]    Max. saturated fraction              (-)

    @property
    def n_cells(self) -> int:
        return self.theta_s.shape[0]


@struct.dataclass
class SoilState:
    """Prognostic per-cell hydrology state.

    Reference fields: h2osoi_liq (SHARED.f90:459), zwt (:466), wa (:472),
    plus the soil matric potential ``smp`` which the reference carries
    implicitly across substeps in a work array (HYDROLOGY.f90:633 computes
    it; :271 and GROW.f90:57 consume the previous value).  The macropore
    store h2osoi_liq_ma exists in the reference but is never evolved
    (SURVEY.md C15); we carry it for diagnostic parity.
    """

    h2osoi_liq: jax.Array     # [n, 8] Liquid water per layer          (mm)
    zwt: jax.Array            # [n]    Water table depth                (m)
    wa: jax.Array             # [n]    Aquifer water store             (mm)
    smp: jax.Array            # [n, 8] Matric potential (lagged)       (mm)
    h2osoi_liq_ma: jax.Array  # [n, 8] Macropore liquid water          (mm)


@struct.dataclass
class VegState:
    """Prognostic per-cell vegetation state.

    Reference fields: SHARED.f90:30-52 (plant pools), LAI/LAI_litter, and
    the root distribution rootr_col produced by GROW and consumed by the
    transpiration sink (GROW.f90:178-182; HYDROLOGY.f90:671-672).  The
    reference supports nplants_max = 1 (SHARED.f90:63), so plant arrays are
    stored per cell without a plant axis.
    """

    plant_mass: jax.Array          # [n] Plant structural mass       (g DM)
    plant_foliage_mass: jax.Array  # [n] Foliage mass                (g DM)
    plant_length: jax.Array        # [n] Cylinder length               (mm)
    rdepth: jax.Array              # [n] Rooting depth                 (mm)
    lai: jax.Array                 # [n] Leaf area index          (m^2/m^2)
    lai_litter: jax.Array          # [n] Litter-layer LAI         (m^2/m^2)
    rootr: jax.Array               # [n, 8] Root fraction per layer     (-)
    c_labile: jax.Array            # [n] Labile C pool                (g C)
    n_labile: jax.Array            # [n] Labile N pool                (g N)
    p_labile: jax.Array            # [n] Labile P pool                (g P)


@struct.dataclass
class SnowpackState:
    """Two-layer snowpack prognostics (physics/snow.py two-layer scheme).

    A surface layer (bounded SWE, fast thermal coupling to the air) over
    a base layer, plus retained liquid water.  Layer temperatures carry
    the pack's cold content, so melt is delayed until the pack ripens
    and meltwater/rain can refreeze — the standard intermediate-
    complexity pack (SNOW-17/HBV family).  All fields ``[n]``; zeros
    when the simple degree-day scheme is active.
    """

    swe_surf: jax.Array   # [n] Surface-layer SWE (ice)              (mm)
    swe_base: jax.Array   # [n] Base-layer SWE (ice)                 (mm)
    w_liq: jax.Array      # [n] Retained liquid water                (mm)
    t_surf: jax.Array     # [n] Surface-layer temperature      (K, <= TF)
    t_base: jax.Array     # [n] Base-layer temperature         (K, <= TF)

    @classmethod
    def zeros(cls, n: int, dtype=jnp.float32) -> "SnowpackState":
        # Distinct buffers per field: donated executables
        # (Config.donate_state) reject the same buffer appearing twice.
        def z():
            return jnp.zeros((n,), dtype)

        def tf():
            return jnp.full((n,), c.TF, dtype)

        return cls(swe_surf=z(), swe_base=z(), w_liq=z(),
                   t_surf=tf(), t_base=tf())


@struct.dataclass
class CarbonState:
    """Soil-carbon pools (physics/carbon.py; g C/m^2, ``[n]``).

    New subsystem beyond the reference, which titles itself a water &
    carbon model but has no soil carbon (SURVEY.md C15).  Initial pool
    sizes are modest mid-latitude values; multi-decade spin-up brings
    them toward equilibrium with the local NPP/climate.
    """

    c_litter: jax.Array     # [n] Litter carbon                 (g C/m^2)
    c_soil_fast: jax.Array  # [n] Fast SOM (~10 yr turnover)    (g C/m^2)
    c_soil_slow: jax.Array  # [n] Slow SOM (~100 yr turnover)   (g C/m^2)

    @classmethod
    def initial(cls, n: int, dtype=jnp.float32) -> "CarbonState":
        return cls(c_litter=jnp.full((n,), 100.0, dtype),
                   c_soil_fast=jnp.full((n,), 1000.0, dtype),
                   c_soil_slow=jnp.full((n,), 5000.0, dtype))


@struct.dataclass
class ModelState:
    """Full prognostic state: soil + vegetation + river network.

    ``river_store`` (lateral routing), ``t_soil`` (prognostic soil
    temperature, physics/soiltemp.py), ``swe`` (snowpack) and
    ``h2osoi_ice`` (prognostic soil ice, exchanged with ``h2osoi_liq``
    by the daily phase-change step) are new capabilities beyond the
    reference.  Ice lives here rather than in ``SoilState`` so the
    validated liquid-water hydrology kernels (incl. the Pallas day
    kernel) are untouched: they see only the liquid store, and the
    phase change runs once per day outside them.

    ``swe`` is the pack total in both snow schemes (prognostic for the
    degree-day scheme; a diagnostic mirror of ``snowpack`` totals for
    the two-layer scheme, keeping accumulators/output unchanged).
    """

    soil: SoilState
    veg: VegState
    river_store: jax.Array    # [n] River store for routed flow      (mm)
    t_soil: jax.Array         # [n, nl] Soil temperature column       (K)
    swe: jax.Array            # [n] Snow water equivalent            (mm)
    h2osoi_ice: jax.Array     # [n, nl] Soil ice per layer           (mm)
    snowpack: SnowpackState   # Two-layer pack detail (zeros if unused)
    carbon: CarbonState       # Soil-carbon pools (physics/carbon.py)


@struct.dataclass
class Forcing:
    """Daily climate forcing for one day (PGF variable set).

    Reference: the seven PGF fields read by READ_PGF (READ_PGF.f90:22-109)
    sliced to one day.  Arrays are ``[n]`` over packed land cells; a forcing
    *block* is ``[days, n]`` and is scanned over in the day loop.
    """

    tas: jax.Array    # [n] Surface air temperature                     (K)
    rlds: jax.Array   # [n] Downwelling longwave radiation          (W/m^2)
    rsds: jax.Array   # [n] Downwelling shortwave radiation         (W/m^2)
    huss: jax.Array   # [n] Specific humidity                       (kg/kg)
    ps: jax.Array     # [n] Surface air pressure                       (Pa)
    pr: jax.Array     # [n] Precipitation flux                   (kg/m^2/s)
    rhs: jax.Array    # [n] Relative humidity                           (%)


@struct.dataclass
class SubstepFluxes:
    """Per-substep diagnostic fluxes (mm/s unless noted).

    Mirrors the locals the reference accumulates or dumps in its
    water-balance check (HYDROLOGY.f90:1221-1283).
    """

    qflx_surf: jax.Array       # [n] Surface runoff
    qflx_evap_grnd: jax.Array  # [n] Ground (substrate) evaporation
    qflx_tran_veg: jax.Array   # [n] Canopy transpiration
    rsub_top: jax.Array        # [n] Topographic subsurface runoff
    qflx_rsub_sat: jax.Array   # [n] Saturation-excess drainage
    qcharge: jax.Array         # [n] Aquifer recharge
    rnff: jax.Array            # [n, 9] Per-layer topographic drainage
    residual: jax.Array        # [n] Water-balance residual w1 - w0   (mm)


@struct.dataclass
class AnnualAccumulators:
    """Running annual sums carried through the day scan.

    Replaces the per-cell scalar accumulators of the reference driver
    (HYBRID9.f90:134-146, 235-253) with ``[n]`` arrays.  Unlike the
    reference, ``evap_sum`` is actually accumulated (the reference zeroes
    it but never adds to it — SURVEY.md C15; see DEVIATIONS.md).
    """

    npp_sum: jax.Array          # [n] NPP                      (g DM/m^2/yr)
    discharge_sum: jax.Array    # [n] Routed discharge to ocean        (mm)
    t_surf_sum: jax.Array       # [n] Surface-layer soil temperature    (K)
    plant_mass_sum: jax.Array   # [n] Plant mass                     (g DM)
    rnf_sum: jax.Array          # [n] Runoff                           (mm)
    evap_sum: jax.Array         # [n] Evapotranspiration               (mm)
    tas_sum: jax.Array          # [n] Air temperature                   (K)
    rlds_sum: jax.Array         # [n]
    rsds_sum: jax.Array         # [n]
    huss_sum: jax.Array         # [n]
    ps_sum: jax.Array           # [n]
    pr_sum: jax.Array           # [n]
    rhs_sum: jax.Array          # [n]
    theta_sum: jax.Array        # [n, 8] Volumetric water          (m^3/m^3)
    h2osoi_total_sum: jax.Array  # [n] Total column water              (mm)
    swe_sum: jax.Array          # [n] Snow water equivalent            (mm)
    ice_sum: jax.Array          # [n] Total column soil ice            (mm)
    rh_sum: jax.Array           # [n] Heterotrophic respiration (g C/m^2)
    nee_sum: jax.Array          # [n] Net ecosystem exchange    (g C/m^2)
    c_soil_sum: jax.Array       # [n] Total soil+litter carbon  (g C/m^2)
    n_days: jax.Array           # [] Days accumulated                   (-)
    max_abs_residual: jax.Array  # [n] Max |water-balance residual|    (mm)

    @classmethod
    def zeros(cls, n: int, nsoil: int = c.NSOIL_LAYERS,
              dtype=jnp.float32) -> "AnnualAccumulators":
        # Distinct buffers per field (not one shared zeros array):
        # donated executables (Config.donate_state) reject the same
        # buffer appearing twice in the argument list.
        def z():
            return jnp.zeros((n,), dtype)

        return cls(
            npp_sum=z(), discharge_sum=z(), t_surf_sum=z(),
            plant_mass_sum=z(),
            rnf_sum=z(), evap_sum=z(),
            tas_sum=z(), rlds_sum=z(), rsds_sum=z(), huss_sum=z(),
            ps_sum=z(),
            pr_sum=z(), rhs_sum=z(),
            theta_sum=jnp.zeros((n, nsoil), dtype),
            h2osoi_total_sum=z(),
            swe_sum=z(),
            ice_sum=z(),
            rh_sum=z(),
            nee_sum=z(),
            c_soil_sum=z(),
            n_days=jnp.zeros((), dtype),
            max_abs_residual=z(),
        )


def initial_state(params: SoilParams, dz_mm: np.ndarray, zi_mm: np.ndarray,
                  dtype=jnp.float32) -> ModelState:
    """Build the t=0 prognostic state from soil parameters.

    Follows INIT.f90:707-811: layers start at 40 % of saturation, the water
    table sits 5 m below the bottom soil interface, the aquifer holds
    4000 mm, and one plant of mass 1 g with foliage 0.0435 g (LAI ~ 0.001)
    occupies each cell with an exponential root profile (90 % of roots
    within rdepth; Baldocchi).  ``smp`` is initialised consistently from the
    initial moisture (the reference leaves it uninitialised — see
    DEVIATIONS.md).
    """
    n = params.n_cells
    nsoil = len(dz_mm) - 1          # dz includes the aquifer layer
    dz = jnp.asarray(dz_mm[:nsoil], dtype)
    zi = jnp.asarray(zi_mm, dtype)

    theta_s = params.theta_s.astype(dtype)
    # INIT.f90:730-733 — initial water = 0.4 * theta_s * dz (mm).
    h2osoi_liq = 0.4 * theta_s * dz[None, :]
    h2osoi_liq_ma = 0.4 * 0.1 * dz[None, :] * jnp.ones((n, 1), dtype)
    # Initial smp from theta (Clapp-Hornberger, O13 Eqn 7.94) so the first
    # substep's beta sees a consistent value.
    s = jnp.clip(0.4 * jnp.ones_like(theta_s), 0.01, 1.0)
    smp = jnp.maximum(jnp.asarray(c.SMPMIN, dtype),
                      params.psi_s.astype(dtype) * s ** (-params.bsw.astype(dtype)))

    soil = SoilState(
        h2osoi_liq=h2osoi_liq,
        zwt=jnp.full((n,), float(zi_mm[nsoil] + 5000.0) / 1000.0, dtype),
        wa=jnp.full((n,), 4000.0, dtype),
        smp=smp,
        h2osoi_liq_ma=h2osoi_liq_ma,
    )

    plant_mass = jnp.ones((n,), dtype)
    plant_foliage_mass = jnp.full((n,), 0.0435, dtype)
    plant_length = (400.0 * plant_mass / 3.142e-3) ** (1.0 / 3.0)
    rdepth = 0.3 * plant_length
    lai = plant_foliage_mass * c.SLA / c.PLOT_AREA
    # Exponential root profile (INIT.f90:793-807; GROW.f90:176-182).
    decay = jnp.exp(jnp.log(0.1) / (rdepth / 10.0))
    rootr = (decay[:, None] ** (zi[None, :nsoil] / 10.0)
             - decay[:, None] ** (zi[None, 1:nsoil + 1] / 10.0))
    c_labile = plant_mass * 0.5 * 0.1
    n_labile = c_labile * 0.035
    p_labile = n_labile * 0.025

    veg = VegState(
        plant_mass=plant_mass,
        plant_foliage_mass=plant_foliage_mass,
        plant_length=plant_length,
        rdepth=rdepth,
        lai=lai,
        lai_litter=jnp.full((n,), 0.001, dtype),
        rootr=rootr.astype(dtype),
        c_labile=c_labile,
        n_labile=n_labile,
        p_labile=p_labile,
    )
    return ModelState(soil=soil, veg=veg,
                      river_store=jnp.zeros((n,), dtype),
                      t_soil=jnp.full((n, nsoil), 283.15, dtype),
                      swe=jnp.zeros((n,), dtype),
                      h2osoi_ice=jnp.zeros((n, nsoil), dtype),
                      snowpack=SnowpackState.zeros(n, dtype),
                      carbon=CarbonState.initial(n, dtype))
