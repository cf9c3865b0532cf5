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
