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


def _launch(cfg_path, env_extra, devices_per_proc=2, extra_args=()):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{devices_per_proc}")
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-m", "hybrid9_tpu", "run", "--config", cfg_path,
         "--shard", "--platform", "cpu", "--cache-dir",
         os.path.join(REPO, ".jax_cache_cpu"), *extra_args],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _launch_group(cfg_path, n_procs, devices_per_proc=2, extra_args=()):
    """Launch an n-process distributed group; returns (procs, outs)."""
    port = _free_port()
    procs = [_launch(cfg_path,
                     {"JAX_NUM_PROCESSES": str(n_procs),
                      "JAX_PROCESS_ID": str(pid),
                      "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}"},
                     devices_per_proc=devices_per_proc,
                     extra_args=extra_args)
             for pid in range(n_procs)]
    outs = [r.communicate(timeout=900)[0] for r in procs]
    for i, r in enumerate(procs):
        assert r.returncode == 0, f"process {i} failed:\n{outs[i][-4000:]}"
    return procs, outs


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


def test_two_process_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Multi-host resume (VERDICT r2 item 3): run year 1 under 2
    processes with checkpointing, stop, resume with ``--resume --shard``
    (each process restores ONLY its own shards via the sharded Orbax
    restore), and the year-2 annual file must be bitwise-equal to an
    uninterrupted 2-process run.  The reference has no checkpointing at
    all (SURVEY.md §5) — this is the repo's own headline feature in its
    own headline parallel mode."""
    from hybrid9_tpu.io import netcdf

    # --- uninterrupted 2-process run, 1901-1902 -------------------------
    out_full = str(tmp_path / "full")
    cfg_full = dict(CFG, end_year=1902, output_path=out_full,
                    checkpoint_every_years=1,
                    checkpoint_path=str(tmp_path / "ck_full"))
    p_full = str(tmp_path / "cfg_full.json")
    with open(p_full, "w") as f:
        json.dump(cfg_full, f)
    _launch_group(p_full, 2)

    # --- interrupted: 1901 only, checkpoint written ----------------------
    out_resume = str(tmp_path / "resume")
    ck_path = str(tmp_path / "ck_resume")
    cfg_y1 = dict(CFG, end_year=1901, output_path=out_resume,
                  checkpoint_every_years=1, checkpoint_path=ck_path)
    p_y1 = str(tmp_path / "cfg_y1.json")
    with open(p_y1, "w") as f:
        json.dump(cfg_y1, f)
    _launch_group(p_y1, 2)
    assert os.path.isdir(ck_path) and os.listdir(ck_path)

    # --- resume through 1902 under 2 fresh processes ----------------------
    cfg_y2 = dict(CFG, end_year=1902, output_path=out_resume,
                  checkpoint_every_years=1, checkpoint_path=ck_path)
    p_y2 = str(tmp_path / "cfg_y2.json")
    with open(p_y2, "w") as f:
        json.dump(cfg_y2, f)
    _, outs = _launch_group(p_y2, 2, extra_args=("--resume",))
    for text in outs:
        assert "restored sharded checkpoint for year 1901" in text, \
            f"resume did not use the sharded restore:\n{text[-2000:]}"

    fields = ["tas", "npp", "rnf", "evap", "theta", "theta_total",
              "max_abs_residual"]
    full = netcdf.read_grid_file(os.path.join(out_full, "axy1902.nc"),
                                 fields)
    res = netcdf.read_grid_file(os.path.join(out_resume, "axy1902.nc"),
                                fields)
    for name in fields:
        np.testing.assert_array_equal(
            np.nan_to_num(res[name]), np.nan_to_num(full[name]),
            err_msg=f"resumed year-2 file differs in {name}")


def test_four_process_run_matches_single(tmp_path):
    """4-process scaling rehearsal (VERDICT r2 item 6): the stitcher
    consumes 4 part-files and the result equals a single-process run."""
    from hybrid9_tpu.io import netcdf

    out_single = str(tmp_path / "single")
    p1 = str(tmp_path / "cfg1.json")
    with open(p1, "w") as f:
        json.dump(dict(CFG, output_path=out_single), f)
    r = _launch(p1, {})
    out, _ = r.communicate(timeout=900)
    assert r.returncode == 0, f"single-process run failed:\n{out[-4000:]}"

    out_multi = str(tmp_path / "multi")
    p4 = str(tmp_path / "cfg4.json")
    with open(p4, "w") as f:
        json.dump(dict(CFG, output_path=out_multi), f)
    _launch_group(p4, 4, devices_per_proc=1)

    for pid in range(4):
        assert not os.path.exists(
            os.path.join(out_multi, f"axy1901.part{pid}.nc"))
    fields = ["tas", "evap", "theta", "max_abs_residual"]
    single = netcdf.read_grid_file(
        os.path.join(out_single, "axy1901.nc"), fields)
    multi = netcdf.read_grid_file(
        os.path.join(out_multi, "axy1901.nc"), fields)
    for name in fields:
        np.testing.assert_allclose(
            np.nan_to_num(multi[name]), np.nan_to_num(single[name]),
            rtol=2e-5, atol=1e-6,
            err_msg=f"4-process vs 1-process mismatch in {name}")


def test_host_shard_bounds_indivisible_error(monkeypatch):
    """Indivisible cell counts fail with an actionable message instead of
    a silent mis-split (VERDICT r2 item 6)."""
    import jax

    from hybrid9_tpu.parallel import launch

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    with pytest.raises(ValueError, match="multiple of 3"):
        launch.host_shard_bounds(64)
    lo, hi = launch.host_shard_bounds(96)
    assert (lo, hi) == (32, 64)


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


def test_two_process_resume_across_schema_change(tmp_path):
    """Multi-host resume across a state-schema change (VERDICT r3
    item 4): year-1 runs under 2 processes, the checkpoint is rewritten
    WITHOUT one state field (simulating a checkpoint that predates a
    schema extension), and a 2-process ``--resume`` must migrate —
    sharded partial restore + template fill — and still match the
    uninterrupted run bitwise on all shared fields.  (`swe` is inert
    under this config's snow=False, so the template default equals the
    uninterrupted trajectory.)"""
    from hybrid9_tpu.io import netcdf

    # --- uninterrupted 2-process run, 1901-1902 -------------------------
    out_full = str(tmp_path / "full")
    cfg_full = dict(CFG, end_year=1902, output_path=out_full,
                    checkpoint_every_years=1,
                    checkpoint_path=str(tmp_path / "ck_full"))
    p_full = str(tmp_path / "cfg_full.json")
    with open(p_full, "w") as f:
        json.dump(cfg_full, f)
    _launch_group(p_full, 2)

    # --- interrupted: 1901 only, checkpoint written ----------------------
    out_resume = str(tmp_path / "resume")
    ck_path = str(tmp_path / "ck_resume")
    cfg_y1 = dict(CFG, end_year=1901, output_path=out_resume,
                  checkpoint_every_years=1, checkpoint_path=ck_path)
    p_y1 = str(tmp_path / "cfg_y1.json")
    with open(p_y1, "w") as f:
        json.dump(cfg_y1, f)
    _launch_group(p_y1, 2)

    # --- rewrite the checkpoint as an "old schema" (drop swe) ------------
    import jax

    import orbax.checkpoint as ocp
    ck_old = str(tmp_path / "ck_old")
    mgr = ocp.CheckpointManager(os.path.abspath(ck_path),
                                item_handlers=ocp.StandardCheckpointHandler())
    step = mgr.latest_step()
    # The checkpoint was written under a different (2-process) device
    # topology, so a raw restore is rejected; build the abstract tree
    # from the checkpoint's own metadata instead.
    meta_tree = getattr(mgr.item_metadata(step), "tree", None)

    one_dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def _abstract(node):
        if isinstance(node, dict):
            return {k: _abstract(v) for k, v in node.items()}
        return jax.ShapeDtypeStruct(tuple(node.shape), node.dtype,
                                    sharding=one_dev)

    raw = mgr.restore(
        step, args=ocp.args.StandardRestore(_abstract(meta_tree)))
    mgr.close()
    assert "swe" in raw
    raw.pop("swe")
    mgr2 = ocp.CheckpointManager(os.path.abspath(ck_old))
    mgr2.save(step, args=ocp.args.StandardSave(raw))
    mgr2.wait_until_finished()
    mgr2.close()

    # --- resume through 1902 under 2 fresh processes ---------------------
    cfg_y2 = dict(CFG, end_year=1902, output_path=out_resume,
                  checkpoint_every_years=1, checkpoint_path=ck_old)
    p_y2 = str(tmp_path / "cfg_y2.json")
    with open(p_y2, "w") as f:
        json.dump(cfg_y2, f)
    _, outs = _launch_group(p_y2, 2, extra_args=("--resume",))
    for text in outs:
        assert "sharded schema migration: 1 field(s)" in text, \
            f"resume did not migrate:\n{text[-2000:]}"
        assert "restored sharded checkpoint for year 1901" in text

    fields = ["tas", "npp", "rnf", "evap", "theta", "theta_total",
              "max_abs_residual"]
    full = netcdf.read_grid_file(os.path.join(out_full, "axy1902.nc"),
                                 fields)
    res = netcdf.read_grid_file(os.path.join(out_resume, "axy1902.nc"),
                                fields)
    for name in fields:
        np.testing.assert_array_equal(
            np.nan_to_num(res[name]), np.nan_to_num(full[name]),
            err_msg=f"schema-migrated resume differs in {name}")


def _launch_aux(subcmd, cfg_path, env_extra, extra_args,
                devices_per_proc=2):
    """Launch an auxiliary-driver CLI subcommand (assimilate/calibrate)
    the same way _launch runs `run`."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{devices_per_proc}")
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-m", "hybrid9_tpu", subcmd, "--config",
         cfg_path, "--platform", "cpu", *extra_args],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def test_two_process_assimilate_matches_single(tmp_path):
    """Sharded multi-host DA (VERDICT r4 item 1): a twin-experiment
    `assimilate --shard` across two real processes — per-host forcing
    slabs, cell-sharded forecast + analysis, allgathered posterior —
    equals the single-process unsharded run."""
    cfg = dict(CFG)
    cfg.pop("checkpoint_every_years", None)
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    da_args = ["--obs-twin", "0.5", "--days", "8", "--members", "4",
               "--spread", "0.3", "--seed", "2"]

    out_single = str(tmp_path / "single.npz")
    r = _launch_aux("assimilate", p, {}, da_args + ["--out", out_single],
                    devices_per_proc=1)
    out, _ = r.communicate(timeout=900)
    assert r.returncode == 0, f"single-process DA failed:\n{out[-4000:]}"

    out_multi = str(tmp_path / "multi.npz")
    port = _free_port()
    procs = [_launch_aux("assimilate", p, {
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(pid),
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
    }, da_args + ["--shard", "--out", out_multi]) for pid in range(2)]
    outs = [r.communicate(timeout=900)[0] for r in procs]
    for i, r in enumerate(procs):
        assert r.returncode == 0, \
            f"DA process {i} failed:\n{outs[i][-4000:]}"

    with np.load(out_single) as s, np.load(out_multi) as m:
        assert int(s["n_land"]) == int(m["n_land"])
        np.testing.assert_allclose(m["theta_mean"], s["theta_mean"],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(m["y_pred_mean"], s["y_pred_mean"],
                                   rtol=2e-4, atol=2e-4)
        # The analysis pulled the multipliers toward the truth (a short
        # 8-day window moves them only part-way; the full recovery is
        # pinned by tests/test_assimilate.py).
        assert float(np.mean(m["theta_mean"])) > 0.0


def test_two_process_calibrate_matches_single(tmp_path):
    """Sharded multi-host per-cell calibration (VERDICT r4 item 1,
    calibrate leg): `calibrate --config --per-cell --shard` across two
    processes equals the single-process fit."""
    cfg = dict(CFG)
    cfg.pop("checkpoint_every_years", None)
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    cal_args = ["--per-cell", "--obs-twin", "0.4", "--fields", "hksat",
                "--days", "6", "--steps", "4", "--lr", "0.2"]

    out_single = str(tmp_path / "single.npz")
    r = _launch_aux("calibrate", p, {}, cal_args + ["--out", out_single],
                    devices_per_proc=1)
    out, _ = r.communicate(timeout=900)
    assert r.returncode == 0, \
        f"single-process calibrate failed:\n{out[-4000:]}"

    out_multi = str(tmp_path / "multi.npz")
    port = _free_port()
    procs = [_launch_aux("calibrate", p, {
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(pid),
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
    }, cal_args + ["--shard", "--out", out_multi]) for pid in range(2)]
    outs = [r.communicate(timeout=900)[0] for r in procs]
    for i, r in enumerate(procs):
        assert r.returncode == 0, \
            f"calibrate process {i} failed:\n{outs[i][-4000:]}"

    with np.load(out_single) as s, np.load(out_multi) as m:
        np.testing.assert_allclose(m["hksat"], s["hksat"],
                                   rtol=5e-3, atol=5e-4)
