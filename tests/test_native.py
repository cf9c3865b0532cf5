"""Native host I/O library (native/h9io.cpp) vs NumPy fallbacks."""

import numpy as np
import pytest

from hybrid9_tpu.io import native


def test_box_average_matches_numpy():
    rng = np.random.RandomState(0)
    fine = rng.rand(120, 240)
    fine[::7, ::3] = np.nan
    blocks = fine.reshape(20, 6, 40, 6)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = np.nanmean(blocks, axis=(1, 3))
    out = native.box_average(fine, 6)
    np.testing.assert_allclose(out, ref, rtol=1e-12, equal_nan=True)


def test_pack_gather_scatter_roundtrip():
    rng = np.random.RandomState(1)
    size = 10000
    idx = np.sort(rng.choice(size, 2000, replace=False)).astype(np.int64)
    for dtype in (np.float32, np.float64):
        src = rng.rand(size).astype(dtype)
        packed = native.pack_gather(src, idx, 2048, fill=-5.0)
        assert packed.dtype == dtype
        np.testing.assert_array_equal(packed[:2000], src[idx])
        assert np.all(packed[2000:] == -5.0)
        back = native.scatter(packed, idx, size)
        np.testing.assert_array_equal(back[idx], src[idx])
        mask = np.ones(size, bool)
        mask[idx] = False
        assert np.all(np.isnan(back[mask]))


def test_pack_forcing_block():
    rng = np.random.RandomState(2)
    brick = rng.rand(5, 30, 40).astype(np.float32)
    idx = rng.choice(1200, 300, replace=False).astype(np.int64)
    out = native.pack_forcing_block(brick, idx, 512)
    assert out.shape == (5, 512) and out.dtype == np.float32
    np.testing.assert_array_equal(out[:, :300],
                                  brick.reshape(5, -1)[:, idx])
    assert np.all(out[:, 300:] == 0.0)


def test_native_lib_is_built():
    """The C++ library should be present in CI-equivalent environments;
    skip (not fail) where only the fallback exists."""
    if not native.available():
        pytest.skip("libh9io.so not built (fallback paths still tested)")
    assert native.available()
