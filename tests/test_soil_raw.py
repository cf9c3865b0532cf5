"""Raw soil-archive ingest pipeline (data/soil_raw.py).

End-to-end: synthesized HWSD + BNU-layout archives -> prepare_soil ->
preprocessed file -> load_soil -> SoilParams -> a short simulated run.
The analog of the reference's INIT-time soil pipeline
(SOURCE/INIT.f90:473-726), validated against the synthesizer's
coarse-truth fields.
"""

import numpy as np
import pytest

from hybrid9_tpu.config import Config
from hybrid9_tpu.data.soil import load_soil
from hybrid9_tpu.data.soil_raw import prepare_soil, regrid_fine_variable
from hybrid9_tpu.data.synthetic import synthesize_raw_soil_archive
from hybrid9_tpu.io.netcdf import read_grid_file

pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("raw_soil"))
    return synthesize_raw_soil_archive(out, resolution_deg=4.0,
                                       factor=12, n_layers=8, seed=3)


def test_regrid_fine_variable_recovers_coarse(archive):
    """Band-chunked box-average recovers the coarse truth to sub-grid
    noise tolerance (+-5 % multiplicative, mean ~= 1)."""
    import os
    path = os.path.join(archive["bnu_dir"], "theta_s_l1.nc4")
    coarse = regrid_fine_variable(path, "theta_s", 45, 90,
                                  band_coarse_rows=7)  # uneven bands
    truth = archive["truth"]["theta_s"][:, :, 0]
    land = np.isfinite(truth)
    assert np.isfinite(coarse[land]).all()
    np.testing.assert_allclose(coarse[land], truth[land], rtol=0.02)
    # Ocean stays missing.
    assert not np.isfinite(coarse[~land]).any()


def test_prepare_soil_units_and_fields(archive, tmp_path):
    out = str(tmp_path / "soil_prep.nc")
    prepare_soil(archive["hwsd"], archive["bnu_dir"], out,
                 n_layers=8, fmax_path=archive["fmax"])
    fields = read_grid_file(out, ["theta_s", "hksat", "lambda", "psi_s",
                                  "fmax", "soil_tex"])
    truth = archive["truth"]
    land = np.isfinite(truth["theta_s"][:, :, 0])
    # Unit conversions (INIT.f90:602-631): archive -> model units.
    np.testing.assert_allclose(fields["theta_s"][land],
                               truth["theta_s"][land] / 1.0e3, rtol=0.02)
    np.testing.assert_allclose(fields["hksat"][land],
                               10.0 * truth["k_s"][land] / 86400.0,
                               rtol=0.02)
    np.testing.assert_allclose(fields["lambda"][land],
                               truth["lambda"][land] / 1.0e3, rtol=0.02)
    np.testing.assert_allclose(fields["psi_s"][land],
                               10.0 * truth["psi_s"][land], rtol=0.02)
    # Fmax: present cells near the synthesized values, missing cells got
    # the reference default 0.3809 (INIT.f90:652-680).
    fmax = fields["fmax"]
    land2d = archive["mask"]
    assert np.nanmin(fmax[land2d]) >= 0.05 - 1e-6
    assert np.nanmax(fmax[land2d]) <= 0.6 + 1e-6
    tex = fields["soil_tex"]
    assert set(np.unique(tex[land2d])) <= set(range(14))


def test_prepare_soil_without_fmax_uses_default(archive, tmp_path):
    out = str(tmp_path / "soil_prep_nofmax.nc")
    prepare_soil(archive["hwsd"], archive["bnu_dir"], out, n_layers=8)
    fields = read_grid_file(out, ["fmax"])
    land2d = archive["mask"]
    np.testing.assert_allclose(fields["fmax"][land2d], 0.3809, rtol=1e-5)


def test_raw_to_simulation_year(archive, tmp_path):
    """The VERDICT round-1 'done' bar: raw archives -> SoilParams ->
    one simulated year, conservation bounded."""
    from hybrid9_tpu.data.forcing import SyntheticForcingProvider
    from hybrid9_tpu.run import Simulation

    cfg = Config(resolution_deg=4.0, start_year=1901, end_year=1901,
                 soil_source="raw",
                 soil_hwsd_path=archive["hwsd"],
                 soil_bnu_dir=archive["bnu_dir"],
                 soil_fmax_path=archive["fmax"],
                 soil_path=str(tmp_path / "soil_prep_run.nc"),
                 cell_block=256, nisurf=8, forcing_block_days=61,
                 use_pallas=False, write_annual=False,
                 output_path=str(tmp_path))
    grid, params = load_soil(cfg)
    # Land selection honors the reference's computable-cell test:
    # textured soil, not class 13, non-degenerate porosity.
    assert 0 < grid.n_land < archive["mask"].sum()
    assert np.all(np.asarray(params.theta_s)[:grid.n_land] > 0.2)
    assert np.all(np.asarray(params.hksat)[:grid.n_land] > 0.0)
    assert np.all(np.asarray(params.psi_s)[:grid.n_land] < 0.0)

    sim = Simulation(cfg, params, land_grid=grid)
    provider = SyntheticForcingProvider(grid.n_padded, seed=5,
                                        lat=grid.cell_lat)
    means = sim.run_year(1901, provider)
    assert float(np.max(means["max_abs_residual"][:grid.n_land])) < 0.1

    # The prep product is reusable directly (soil_source='netcdf').
    cfg2 = Config(**{**cfg.__dict__, "soil_source": "netcdf"})
    grid2, params2 = load_soil(cfg2)
    assert grid2.n_land == grid.n_land
    np.testing.assert_array_equal(np.asarray(params2.theta_s),
                                  np.asarray(params.theta_s))
