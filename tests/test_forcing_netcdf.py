"""PGF-style NetCDF forcing ingest (the READ_PGF / READ_NET_CDF_3DR
equivalent) against generated NetCDF-4 archives."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax.numpy as jnp  # noqa: E402

from hybrid9_tpu.data.forcing import (PGF_VARIABLES,
                                      NetCDFForcingProvider,
                                      PrefetchingProvider)
from hybrid9_tpu.grids.grid import make_land_grid, synthetic_land_mask


@pytest.fixture(scope="module")
def pgf_archive(tmp_path_factory):
    """Tiny PGF-like archive: one .nc4 per variable, [time, lat, lon]."""
    tmp = tmp_path_factory.mktemp("pgf")
    mask = synthetic_land_mask(resolution_deg=12.0, seed=2)
    ny, nx = mask.shape
    ndays = 25
    rng = np.random.RandomState(0)
    data = {}
    for var in PGF_VARIABLES:
        arr = rng.rand(ndays, ny, nx).astype(np.float32) * 100.0 + 200.0
        with h5py.File(tmp / f"{var}_pgf_test.nc4", "w") as f:
            f.create_dataset(var, data=arr)
        data[var] = arr
    return tmp, mask, data


def test_netcdf_provider_reads_block(pgf_archive):
    tmp, mask, data = pgf_archive
    grid = make_land_grid(mask, 12.0, pad_multiple=32)
    provider = NetCDFForcingProvider(
        str(tmp / "{var}_pgf_test.nc4"), grid, dtype=jnp.float32)
    block = provider(1901, start_doy=3, n_days=5)
    assert block.tas.shape == (5, grid.n_padded)
    # Values must match a direct gather of days 2..6 (0-based).
    expect = data["tas"][2:7].reshape(5, -1)[:, grid.land_idx]
    np.testing.assert_allclose(np.asarray(block.tas)[:, :grid.n_land],
                               expect, rtol=1e-6)
    # Padding lanes replicate a real cell's forcing (finite, benign —
    # zero-fill meant tas = 0 K and NaN ET in the padding lanes).
    pad = np.asarray(block.tas)[:, grid.n_land:]
    assert np.all(pad == np.asarray(block.tas)[:, :1])


def test_cell_range_narrows_reads_to_row_band(pgf_archive):
    """Per-host slab reads hyperslab only the slab's lat-row band and
    reproduce the corresponding slice of the full-read provider
    (READ_NET_CDF_3DR.f90:95-97 ownership pattern)."""
    tmp, mask, data = pgf_archive
    grid = make_land_grid(mask, 12.0, pad_multiple=32)
    pattern = str(tmp / "{var}_pgf_test.nc4")
    full = NetCDFForcingProvider(pattern, grid)(1901, 1, 6)
    n = grid.n_padded
    half = n // 2
    rows_covered = 0
    for lo, hi in ((0, half), (half, n)):
        prov = NetCDFForcingProvider(pattern, grid, cell_range=(lo, hi))
        # Strict subset of the global row range.
        assert 0 <= prov.row_lo < prov.row_hi <= grid.ny
        assert (prov.row_hi - prov.row_lo) < grid.ny
        rows_covered += prov.row_hi - prov.row_lo
        blk = prov(1901, 1, 6)
        assert blk.tas.shape == (6, hi - lo)
        for var in ("tas", "pr", "ps"):
            np.testing.assert_array_equal(
                np.asarray(getattr(blk, var))[:, :prov.n_real],
                np.asarray(getattr(full, var))[:, lo:lo + prov.n_real])
        # Padding lanes inside the slab replicate a local real cell.
        padlanes = np.asarray(blk.tas)[:, prov.n_real:]
        if padlanes.size:
            assert np.all(padlanes == np.asarray(blk.tas)[:, :1])
    # The two bands may overlap by at most one row (a split mid-row).
    assert rows_covered <= grid.ny + 1


def test_cell_range_all_padding_slab(pgf_archive):
    """A slab past n_land (possible on the last host) yields finite,
    benign forcing without touching the files."""
    tmp, mask, data = pgf_archive
    grid = make_land_grid(mask, 12.0, pad_multiple=512)
    assert grid.n_padded > grid.n_land
    prov = NetCDFForcingProvider(
        str(tmp / "{var}_pgf_test.nc4"), grid,
        cell_range=(grid.n_padded - 8, grid.n_padded))
    assert prov.n_real == 0
    blk = prov(1901, 1, 4)
    arr = np.asarray(blk.tas)
    assert arr.shape == (4, 8)
    assert np.all(np.isfinite(arr)) and np.all(arr > 100.0)


def test_netcdf_provider_with_prefetch(pgf_archive):
    tmp, mask, data = pgf_archive
    grid = make_land_grid(mask, 12.0, pad_multiple=32)
    provider = PrefetchingProvider(NetCDFForcingProvider(
        str(tmp / "{var}_pgf_test.nc4"), grid))
    provider.prefetch(1901, 1, 10)
    block = provider(1901, 1, 10)
    direct = NetCDFForcingProvider(
        str(tmp / "{var}_pgf_test.nc4"), grid)(1901, 1, 10)
    np.testing.assert_array_equal(np.asarray(block.pr),
                                  np.asarray(direct.pr))
    provider.close()
