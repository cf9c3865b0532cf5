"""Real 2-process distributed smoke test (CPU backend).

The one leg of the launch/comm story (SURVEY.md C11/C13) a single-process
virtual-device mesh cannot exercise: two OS processes join through
``jax.distributed.initialize`` (local coordinator), each owns half the
packed cell axis, each READS only its own forcing slab
(READ_NET_CDF_3DR.f90:95-97 ownership) and WRITES only its own slab of
the annual file, with the primary stitching the global axy<year>.nc
(WRITE_NET_CDF_3DR.f90:93-257).  The result must match a single-process
run of the identical configuration.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = dict(resolution_deg=12.0, start_year=1901, end_year=1901,
           forcing_block_days=366, cell_block=32, nisurf=4,
           use_pallas=False, frozen_soil=False, snow=False,
           lateral_routing=False, lateral_groundwater=False,
           checkpoint_every_years=0)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(cfg_path, env_extra):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-m", "hybrid9_tpu", "run", "--config", cfg_path,
         "--shard", "--platform", "cpu", "--cache-dir",
         os.path.join(REPO, ".jax_cache_cpu")],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _make_pgf_archive(dir_path, ny, nx, ndays=365, seed=3):
    """Tiny full-year PGF-like archive (one .nc4 per variable)."""
    import h5py

    from hybrid9_tpu.data.forcing import PGF_VARIABLES
    rng = np.random.RandomState(seed)
    base = {"tas": 278.0, "rlds": 300.0, "rsds": 180.0, "huss": 0.006,
            "ps": 1.0e5, "pr": 3.0e-5, "rhs": 60.0}
    os.makedirs(dir_path, exist_ok=True)
    for var in PGF_VARIABLES:
        arr = (base[var] * (1.0 + 0.1 * rng.rand(ndays, ny, nx))
               ).astype(np.float32)
        with h5py.File(os.path.join(dir_path, f"{var}_test.nc4"),
                       "w") as f:
            f.create_dataset(var, data=arr)
    return os.path.join(dir_path, "{var}_test.nc4")


def test_two_process_pgf_reads_are_spatially_narrowed(tmp_path):
    """2-process PGF run: each process hyperslabs ONLY its own lat-row
    band (< 60% of rows for a 2-way split; READ_NET_CDF_3DR.f90:95-97)
    and the stitched output equals the single-process run."""
    pytest.importorskip("h5py")
    from hybrid9_tpu.io import netcdf

    pattern = _make_pgf_archive(str(tmp_path / "pgf"), ny=15, nx=30)
    base = dict(CFG, forcing="pgf", forcing_path=pattern)

    out_single = str(tmp_path / "single")
    p1 = str(tmp_path / "cfg1.json")
    with open(p1, "w") as f:
        json.dump(dict(base, output_path=out_single), f)
    r = _launch(p1, {})
    out, _ = r.communicate(timeout=900)
    assert r.returncode == 0, f"single-process run failed:\n{out[-4000:]}"

    out_multi = str(tmp_path / "multi")
    p2 = str(tmp_path / "cfg2.json")
    with open(p2, "w") as f:
        json.dump(dict(base, output_path=out_multi), f)
    port = _free_port()
    procs = [_launch(p2, {"JAX_NUM_PROCESSES": "2",
                          "JAX_PROCESS_ID": str(pid),
                          "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}"})
             for pid in range(2)]
    outs = [r.communicate(timeout=900)[0] for r in procs]
    for i, r in enumerate(procs):
        assert r.returncode == 0, f"process {i} failed:\n{outs[i][-4000:]}"

    # Each process logged its narrowed read band; assert a strict subset.
    import re
    for i, text in enumerate(outs):
        m = re.search(r"pgf shard read band: rows \[(\d+), (\d+)\) of "
                      r"(\d+)", text)
        assert m, f"process {i} did not log its read band:\n{text[-2000:]}"
        lo, hi, ny = (int(g) for g in m.groups())
        frac = (hi - lo) / ny
        assert frac < 0.60, \
            f"process {i} read {frac:.0%} of rows — not narrowed"

    single = netcdf.read_grid_file(
        os.path.join(out_single, "axy1901.nc"), ["tas", "evap", "theta"])
    multi = netcdf.read_grid_file(
        os.path.join(out_multi, "axy1901.nc"), ["tas", "evap", "theta"])
    for name in single:
        np.testing.assert_allclose(
            np.nan_to_num(multi[name]), np.nan_to_num(single[name]),
            rtol=2e-5, atol=1e-6, err_msg=f"PGF 2-process mismatch {name}")


def test_two_process_run_matches_single(tmp_path):
    from hybrid9_tpu.io import netcdf

    # --- single-process reference (same CLI path, 2 virtual devices) ---
    out_single = str(tmp_path / "single")
    cfg1 = dict(CFG, output_path=out_single)
    p1 = str(tmp_path / "cfg1.json")
    with open(p1, "w") as f:
        json.dump(cfg1, f)
    r = _launch(p1, {})
    out, _ = r.communicate(timeout=900)
    assert r.returncode == 0, f"single-process run failed:\n{out[-4000:]}"

    # --- two real processes, coordinator on localhost ------------------
    out_multi = str(tmp_path / "multi")
    cfg2 = dict(CFG, output_path=out_multi)
    p2 = str(tmp_path / "cfg2.json")
    with open(p2, "w") as f:
        json.dump(cfg2, f)
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(_launch(p2, {
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        }))
    outs = []
    for r in procs:
        out, _ = r.communicate(timeout=900)
        outs.append(out)
    for i, r in enumerate(procs):
        assert r.returncode == 0, \
            f"process {i} failed:\n{outs[i][-4000:]}"

    # Each process wrote its own slab part; the primary stitched and
    # consumed (deleted) the parts so reruns cannot mix stale slabs.
    for pid in range(2):
        assert not os.path.exists(
            os.path.join(out_multi, f"axy1901.part{pid}.nc"))
    path_m = os.path.join(out_multi, "axy1901.nc")
    path_s = os.path.join(out_single, "axy1901.nc")
    assert os.path.exists(path_m)

    fields = ["tas", "npp", "rnf", "evap", "theta", "theta_total",
              "max_abs_residual"]
    single = netcdf.read_grid_file(path_s, fields)
    multi = netcdf.read_grid_file(path_m, fields)
    for name in fields:
        a, b = single[name], multi[name]
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.nan_to_num(b), np.nan_to_num(a), rtol=2e-5, atol=1e-6,
            err_msg=f"2-process vs 1-process mismatch in {name}")
    # Physical sanity on the stitched file.
    assert 200.0 < np.nanmean(multi["tas"]) < 320.0
    assert np.nanmax(multi["max_abs_residual"]) < 0.1
