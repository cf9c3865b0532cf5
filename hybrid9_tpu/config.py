"""Run configuration for HYBRID9-TPU.

Replaces the reference's positional, line-ordered ``driver.txt`` config file
and CONTROL module globals (reference: EXECUTE/driver.txt:1-26 parsed at
SOURCE/INIT.f90:181-206; SOURCE/CONTROL.f90) with a typed, declarative
dataclass.  The canonical vertical grid (soil-interface depths ``zi``) lives
here because the reference treats it as configuration (driver.txt:17-26).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import numpy as np

from .physics import constants as c

# Canonical 0.5-degree soil-interface depths in mm, surface down to the
# aquifer interface (reference: EXECUTE/driver.txt:17-26).  zi[0] = 0 is the
# surface; zi[9] = 5000 mm creates the virtual aquifer layer.
CANONICAL_ZI_MM: Tuple[float, ...] = (
    0.0, 45.0, 91.0, 166.0, 289.0, 493.0, 829.0, 1383.0, 2296.0, 5000.0,
)


def exponential_interfaces(n_soil: int, z_bottom_mm: float = 2296.0,
                           z_aquifer_mm: float = 5000.0,
                           top_dz_mm: float = 20.0) -> Tuple[float, ...]:
    """Geometrically growing soil-interface depths for ``n_soil`` layers.

    Generalises the reference's hand-tuned 8-layer grid to arbitrary layer
    counts (e.g. the 20-layer single-column configuration): layer
    thicknesses grow geometrically from ``top_dz_mm`` so the soil column
    bottoms out at ``z_bottom_mm``, with one final interface at
    ``z_aquifer_mm`` forming the aquifer layer.
    """
    import numpy as _np

    def total(r: float) -> float:
        if abs(r - 1.0) < 1e-12:
            return top_dz_mm * n_soil
        return top_dz_mm * (r ** n_soil - 1.0) / (r - 1.0)

    lo, hi = 1.0, 4.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if total(mid) < z_bottom_mm:
            lo = mid
        else:
            hi = mid
    r = 0.5 * (lo + hi)
    dz = top_dz_mm * r ** _np.arange(n_soil)
    zi = _np.concatenate([[0.0], _np.cumsum(dz)])
    zi[-1] = z_bottom_mm
    return tuple(float(z) for z in zi) + (float(z_aquifer_mm),)


@dataclasses.dataclass(frozen=True)
class LayerGrid:
    """Vertical layer geometry derived from interface depths.

    Mirrors the derivation at SOURCE/INIT.f90:252-263: layer thicknesses
    ``dz[i] = zi[i+1] - zi[i]`` and node (centre) depths
    ``zc[i] = zi[i+1] - dz[i]/2``.  All depths in mm, positive downward.
    """

    zi: np.ndarray   # [nlevgrnd + 1] interface depths, zi[0] = 0     (mm)
    dz: np.ndarray   # [nlevgrnd] layer thicknesses                   (mm)
    zc: np.ndarray   # [nlevgrnd] layer node depths                   (mm)

    @classmethod
    def from_interfaces(cls, zi_mm: Sequence[float] = CANONICAL_ZI_MM
                        ) -> "LayerGrid":
        zi = np.asarray(zi_mm, dtype=np.float64)
        if zi[0] != 0.0 or np.any(np.diff(zi) <= 0.0):
            raise ValueError("zi must start at 0 and increase monotonically")
        dz = np.diff(zi)
        zc = zi[1:] - dz / 2.0
        return cls(zi=zi, dz=dz, zc=zc)

    @property
    def nlevgrnd(self) -> int:
        return int(self.dz.shape[0])

    @property
    def nsoil(self) -> int:
        """Hydrologically active soil layers (excludes aquifer layer)."""
        return self.nlevgrnd - 1


@dataclasses.dataclass(frozen=True)
class Config:
    """Declarative run configuration.

    Field-by-field equivalent of driver.txt (reference: EXECUTE/driver.txt)
    plus new knobs the TPU build needs (dtype, sharding, checkpointing).
    """

    # --- Time stepping (driver.txt:2,4-5) ---------------------------------
    nisurf: int = c.NISURF_DEFAULT    # Surface substeps per day.
    start_year: int = 1901            # First simulated calendar year.
    end_year: int = 1910              # Last simulated calendar year.

    # --- Grid / domain ----------------------------------------------------
    resolution_deg: float = 0.5       # Lon/lat cell size (0.5 or 0.25).
    zi_mm: Tuple[float, ...] = CANONICAL_ZI_MM

    # --- Forcing (driver.txt:3; READ_PGF.f90) -----------------------------
    forcing: str = "synthetic"        # "synthetic" | "device-synthetic"
                                      # | "pgf" | "site".
    forcing_path: Optional[str] = None
    forcing_block_days: int = 366     # Days of forcing resident per block.

    # --- Soil parameters (INIT.f90:473-726) -------------------------------
    soil_source: str = "synthetic"    # "synthetic" | "netcdf" | "raw".
    soil_path: Optional[str] = None   # Preprocessed per-layer file
                                      # (written by prep-soil for "raw").
    soil_hwsd_path: Optional[str] = None   # Raw HWSD texture NetCDF.
    soil_bnu_dir: Optional[str] = None     # Raw BNU 30-arc-sec archive dir.
    soil_fmax_path: Optional[str] = None   # Raw Fmax NetCDF (optional).

    # --- Site / single-column mode (driver.txt:6-16) ----------------------
    interactive: bool = False         # Single-cell diagnostic mode.
    site_lon: float = -120.95         # Focus longitude (Vaira Ranch).
    site_lat: float = 38.41           # Focus latitude.
    spinup_years: int = 0             # Spin-up repeats (LCLIM analog).

    # --- Output / checkpointing -------------------------------------------
    output_path: str = "output"
    write_annual: bool = True         # Write axy<year> annual diagnostics.
    checkpoint_every_years: int = 0   # 0 = disabled.
    checkpoint_path: str = "checkpoints"

    # --- TPU-specific -----------------------------------------------------
    dtype: str = "float32"            # Working dtype for the physics.
    mesh_axis: str = "cells"          # Mesh axis name for the cell shard.
    cell_block: int = 1024            # Pad n_land to a multiple of this.
    donate_state: bool = False        # Donate state/accumulator buffers to
                                      # block_step (saves one state-sized
                                      # HBM copy per block).  Default off:
                                      # the axon TPU backend fails D2H
                                      # transfers of outputs from donated-
                                      # input executables (step.py note);
                                      # flip on where the backend allows.
    use_pallas: Optional[bool] = None  # VMEM-resident Pallas day kernel;
                                       # None = auto (TPU only).
    pallas_block: int = 1024          # Cells per Pallas VMEM tile.
    pallas_interpret: bool = False    # Run Pallas kernels in interpreter
                                      # mode (CPU tests only).
    zd09_every: int = 8               # Refresh the ZD09 equilibrium
                                      # profile every N substeps (at
                                      # NISURF=48, 8 = every 4 h; the
                                      # water table it depends on moves
                                      # mm/day).  1 = every substep =
                                      # exact reference behavior (all
                                      # parity tests use 1).  8 cuts
                                      # ~25% of the substep's
                                      # transcendentals (+24% bench);
                                      # conservation is structurally
                                      # unaffected (DEVIATIONS.md).

    # --- Lateral flow (new capabilities) ----------------------------------
    lateral_routing: bool = True      # Route runoff through the D8 net
                                      # (physics/routing.py).
    routing_scheme: str = "kinematic"  # "kinematic" (sub-daily wave at
                                      # physical celerity — the default
                                      # since r5; a linear reservoir
                                      # moves water <= 1 cell/day, wrong
                                      # continental travel times at
                                      # 0.5 deg), "linear" (daily
                                      # reservoir, cheapest) or
                                      # "muskingum" (Muskingum-Cunge,
                                      # per-reach geometry + wave
                                      # attenuation).  Measured flagship
                                      # cost: DEVIATIONS.md "routing
                                      # default".
    routing_k: float = 0.2            # Linear-reservoir release per day.
    routing_form: str = "auto"        # "auto" (default): "grid" for the
                                      # sub-daily schemes (kinematic AND
                                      # muskingum), "packed" for linear.
                                      # "packed": segment-sum over the
                                      # packed cell axis (1-D sharding).
                                      # "grid": dense [ny, nx] halo-
                                      # exchange form — per-direction
                                      # rolls lower to collective-permute
                                      # halos under a sharded mesh, and
                                      # on one chip route ~4x faster
                                      # than the packed scatters
                                      # (PERFORMANCE.md late-r5).
    routing_network_path: Optional[str] = None  # NetCDF with 'flowdir'
                                      # (ESRI D8) and/or 'elevation' (m)
                                      # at model resolution; None =
                                      # synthetic DEM.
    routing_substeps: int = 8         # Sub-daily transfer steps per day.
    routing_celerity: float = 0.8     # Kinematic ref celerity c0 (m/s).
    routing_manning: float = 0.035    # Muskingum-Cunge channel Manning n.
    lateral_groundwater: bool = False  # Halo-exchange aquifer exchange
                                       # (physics/lateral.py).
    lateral_k: float = 1.0e-6         # Groundwater exchange coeff (/day).
    snow: bool = True                 # Daily snowpack (physics/snow.py):
                                      # rain/snow partition + degree-day
                                      # melt feeding the hydrology.
    snow_scheme: str = "degree-day"   # "degree-day" (single store) or
                                      # "twolayer" (cold content, liquid
                                      # retention/refreeze, ripening).
    snow_ddf: float = 3.0             # Degree-day melt factor (mm/K/day).
    snow_albedo: bool = True          # Snow-albedo radiative feedback:
                                      # blend the 0.92 bare-ground SW
                                      # absorptivity toward (1 -
                                      # snow_alpha) by fractional snow
                                      # cover, collapsing Rnet/PAR/ET
                                      # over snow (step.snow_absorptivity).
    snow_alpha: float = 0.70          # Snow shortwave albedo (-).
    snow_masking_swe: float = 10.0    # SWE at 50% snow cover (mm).
    frozen_soil: bool = True          # Frozen-ground hydraulic impedance
                                      # from the prognostic temperature
                                      # column (soiltemp.freeze_impedance).
    soil_ice: bool = True             # Prognostic soil-ice store: daily
                                      # explicit phase change (sensible
                                      # heat <-> ice mass, exactly
                                      # conservative) and impedance from
                                      # the true ice fraction.  False =
                                      # temperature-ramp proxy only.
    carbon: bool = True               # Soil-carbon cascade (physics/
                                      # carbon.py): litter + fast/slow
                                      # SOM pools, Q10/moisture-modified
                                      # decomposition, heterotrophic
                                      # respiration and NEE diagnostics.
                                      # Needs vegetation=True to have
                                      # litter input.
    vegetation: bool = True           # Daily GROW dynamics; False =
                                      # hydrology-only mode (LAI/roots
                                      # frozen at initial values;
                                      # BASELINE.json config 2).

    def layer_grid(self) -> LayerGrid:
        return LayerGrid.from_interfaces(self.zi_mm)

    @property
    def dt(self) -> float:
        """Substep length in seconds (reference: INIT.f90:214)."""
        return c.SDAY / float(self.nisurf)

    @property
    def nx(self) -> int:
        return int(round(360.0 / self.resolution_deg))

    @property
    def ny(self) -> int:
        return int(round(180.0 / self.resolution_deg))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        data = json.loads(text)
        if "zi_mm" in data:
            data["zi_mm"] = tuple(data["zi_mm"])
        return cls(**data)
