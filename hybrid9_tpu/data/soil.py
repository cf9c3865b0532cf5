"""Soil-property ingest pipeline.

TPU-native replacement for the reference's INIT-time soil ingest
(SOURCE/INIT.f90:473-726): HWSD texture mask, BNU 30-arc-sec saturated
properties box-averaged to the model grid, unit conversions, Fmax with the
reference's missing-value default, the -31 bar residual inversion, and the
land-cell selection test.  When the archives are absent the synthetic
generator stands in (data/synthetic.py) so the full pipeline stays
runnable end-to-end.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..grids.grid import LandGrid, make_land_grid, synthetic_land_mask
from ..physics import constants as c
from ..state import SoilParams
from ..utils.logging import get_logger
from .synthetic import synthetic_soil_params

log = get_logger(__name__)

# Reference default when the Fmax field is missing: 3809/10000
# (INIT.f90:652-680).
FMAX_DEFAULT = 0.3809


def box_average(fine: np.ndarray, factor: int) -> np.ndarray:
    """Average a fine-resolution grid down by ``factor`` in each dim.

    The vectorized form of the reference's 60x60 box-average of 30-arc-sec
    BNU data onto 0.5 degrees (INIT.f90:579-600); NaNs (missing soil) are
    excluded from the mean.
    """
    ny, nx = fine.shape
    assert ny % factor == 0 and nx % factor == 0
    from ..io import native
    return native.box_average(np.asarray(fine, np.float64), factor)


def convert_bnu_units(theta_s_raw: np.ndarray, k_s_raw: np.ndarray,
                      lambda_raw: np.ndarray, psi_s_raw: np.ndarray):
    """BNU archive units -> model units (INIT.f90:602-631).

    theta_s: 0.001 cm^3/cm^3 -> -, k_s: cm/day -> mm/s,
    lambda: 0.001 -> -, psi_s: cm -> mm; bsw = 1/lambda.
    """
    theta_s = theta_s_raw / 1.0e3
    hksat = 10.0 * k_s_raw / 86400.0
    lambda_ = np.maximum(lambda_raw / 1.0e3, c.TRUNC)
    psi_s = 10.0 * psi_s_raw
    bsw = 1.0 / lambda_
    return theta_s, hksat, lambda_, psi_s, bsw


def residual_theta(theta_s: np.ndarray, psi_s: np.ndarray,
                   lambda_: np.ndarray) -> np.ndarray:
    """Residual water content at -31 bar (INIT.f90:707-726)."""
    return theta_s * ((-3.1e9 / (1000.0 * 9.8)) / psi_s) ** (-lambda_)


def land_selection_mask(soil_tex: np.ndarray,
                        theta_s_sum: np.ndarray) -> np.ndarray:
    """The reference's computable-cell test (HYBRID9.f90:122-123):
    textured soil, not water bodies (class 13), non-degenerate porosity.
    """
    return (soil_tex > 0) & (soil_tex != 13) & (theta_s_sum > c.TRUNC)


def load_soil(cfg, dtype=jnp.float32,
              land_grid: Optional[LandGrid] = None
              ) -> tuple[LandGrid, SoilParams]:
    """Build (LandGrid, SoilParams) from config.

    ``soil_source == "netcdf"`` expects preprocessed per-layer fields (the
    one-time offline analog of INIT's 30-arc-sec regrid);
    ``soil_source == "raw"`` runs that regrid first (data/soil_raw.py:
    HWSD texture + band-chunked BNU box-average, INIT.f90:473-680) and
    then consumes its product; otherwise the deterministic synthetic
    generator is used.
    """
    soil_path = cfg.soil_path
    if cfg.soil_source == "raw":
        if not (cfg.soil_hwsd_path and cfg.soil_bnu_dir):
            raise ValueError("soil_source='raw' needs soil_hwsd_path "
                             "and soil_bnu_dir")
        from .soil_raw import prepare_soil
        soil_path = soil_path or os.path.join(cfg.output_path,
                                              "soil_prep.nc")
        # Multi-host: exactly one process runs the (expensive) raw
        # regrid; the rest wait for the atomically-published product
        # (write_grid_file publishes via tmp+rename, so a visible file
        # is always complete).  The reference serialized exactly this
        # kind of shared-file access with its MPI token ring
        # (INIT.f90:167-244).
        import jax
        if jax.process_index() == 0:
            prepare_soil(cfg.soil_hwsd_path, cfg.soil_bnu_dir, soil_path,
                         n_layers=cfg.layer_grid().nsoil,
                         fmax_path=cfg.soil_fmax_path)
        else:
            import time as _time
            deadline = _time.monotonic() + 3600.0
            t_start = _time.time()
            while not (os.path.exists(soil_path)
                       and os.path.getmtime(soil_path) >= t_start - 60.0):
                if _time.monotonic() > deadline:
                    raise TimeoutError(
                        f"waiting for process 0 to write {soil_path}")
                _time.sleep(1.0)
    if cfg.soil_source in ("netcdf", "raw") and soil_path:
        from ..io import netcdf as nc
        fields = nc.read_grid_file(
            soil_path,
            ["theta_s", "hksat", "lambda", "psi_s", "fmax", "soil_tex"])
        soil_tex = fields["soil_tex"]
        theta_s = fields["theta_s"]
        mask = land_selection_mask(soil_tex,
                                   np.nansum(theta_s, axis=-1))
        grid = make_land_grid(mask, cfg.resolution_deg, cfg.cell_block)
        # Retain the texture map for the init-diagnostic dump
        # (the reference's soil_tex.nc, INIT.f90:835).
        import dataclasses as _dc
        grid = _dc.replace(grid, soil_tex=np.asarray(soil_tex,
                                                     np.float64))
        lambda_ = np.maximum(fields["lambda"], c.TRUNC)
        raw = dict(
            theta_s=grid.pack(theta_s, fill=0.4),
            hksat=grid.pack(fields["hksat"], fill=1.0e-3),
            lambda_=grid.pack(lambda_, fill=0.2),
            psi_s=grid.pack(fields["psi_s"], fill=-300.0),
            fmax=np.nan_to_num(grid.pack(fields["fmax"],
                                         fill=FMAX_DEFAULT),
                               nan=FMAX_DEFAULT),
        )
        raw["bsw"] = 1.0 / raw["lambda_"]
        raw["theta_m"] = residual_theta(raw["theta_s"], raw["psi_s"],
                                        raw["lambda_"])
        log.info("loaded NetCDF soil: %d land cells (%d padded)",
                 grid.n_land, grid.n_padded)
    else:
        if land_grid is None:
            mask = synthetic_land_mask(cfg.resolution_deg)
            grid = make_land_grid(mask, cfg.resolution_deg,
                                  cfg.cell_block)
        else:
            grid = land_grid
        raw = synthetic_soil_params(grid.n_padded, seed=0,
                                    lat=grid.cell_lat)
        log.info("synthetic soil: %d land cells (%d padded)",
                 grid.n_land, grid.n_padded)

    params = SoilParams(
        theta_s=jnp.asarray(raw["theta_s"], dtype),
        hksat=jnp.asarray(raw["hksat"], dtype),
        lambda_=jnp.asarray(raw["lambda_"], dtype),
        bsw=jnp.asarray(raw["bsw"], dtype),
        psi_s=jnp.asarray(raw["psi_s"], dtype),
        theta_m=jnp.asarray(raw["theta_m"], dtype),
        fmax=jnp.asarray(raw["fmax"], dtype),
    )
    return grid, params
