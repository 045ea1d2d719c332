"""Multi-host (jax.distributed) cell sharding over a 2-process CPU pod.

The reference has no distributed backend (SURVEY.md section 2 parallelism
inventory: "No distributed communication backend exists"); this validates
the TPU-native extension in parallel/multihost.py: two processes x two
virtual CPU devices each form a 4-device global mesh, each process loads
only its slice of the surface, and the smooth spectra must come out
BIT-IDENTICAL to the in-process single-host computation (the canonical
group-tree reduction is process/device-count invariant).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _multihost_worker import fixtures  # noqa: E402

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="session")
def inprocess_reference():
    """Single-host reference results, computed once for every pod shape."""
    from _multihost_worker import compute_inprocess
    return compute_inprocess()


@pytest.mark.parametrize("devices_per_proc", [
    (2, 2),            # the round-2 baseline pod
    (2, 2, 2, 2),      # 4 processes (VERDICT round 2: evidence stopped at 2)
    (3, 2, 1),         # uneven device-per-process split
], ids=lambda d: "x".join(map(str, d)))
def test_multihost_kernels_bit_identical(tmp_path, devices_per_proc,
                                         inprocess_reference):
    """Every multi-host kernel path (smooth VH spectra, VAH spectra, spin
    polarization, dN/dX, feqmod spectra + feqmod dN/dX -- all slice-local)
    must be bit-identical to the in-process single-host computation on
    every process, for 2- and 4-process pods including an uneven
    device-per-process split."""
    ref = inprocess_reference

    nproc = len(devices_per_proc)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = str(_free_port())
    procs = []
    for i, ndev in enumerate(devices_per_proc):
        env = dict(os.environ)
        # per-process device count (heterogeneous pods vary this)
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
        # APPEND to PYTHONPATH (a TPU plugin may load via an existing
        # entry's sitecustomize; replacing the path breaks backend init)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), port,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]

    for i in range(nproc):
        got = np.load(tmp_path / f"proc{i}.npz")
        assert set(got.files) == set(ref)
        for k in ref:
            assert np.isfinite(ref[k]).all() and np.abs(ref[k]).max() > 0, k
            np.testing.assert_array_equal(got[k], ref[k],
                                          err_msg=f"{k} proc{i}")


def test_process_cell_slice_partition():
    """Without a distributed pod: the slice helper on the in-process mesh
    must tile [0, n_global) exactly across 'processes' of 1 device each."""
    import jax
    from is3d_tpu.parallel.mesh import default_mesh
    from is3d_tpu.parallel.multihost import process_cell_slice
    cfg, n_global, *_ = fixtures()
    mesh = default_mesh(axis=cfg.mesh_axis)
    start, stop = process_cell_slice(cfg, n_global, mesh)
    assert start == 0 and stop == n_global  # single process owns everything


def test_multihost_rejects_feqmod():
    import dataclasses
    from is3d_tpu.parallel.multihost import smooth_spectra_multihost
    cfg, n_global, *_ = fixtures()
    cfg = dataclasses.replace(cfg, df_mode=3)
    with pytest.raises(ValueError, match="df_mode 1/2"):
        smooth_spectra_multihost({}, n_global, None, None, None, cfg)


def _make_run_dir(base):
    import shutil
    d = base / "run"
    (d / "input").mkdir(parents=True)
    shutil.copy("/root/reference/input/surface.dat", d / "input/surface.dat")
    shutil.copy("/root/reference/iS3D_parameters.dat",
                d / "iS3D_parameters.dat")
    for name in ("PDG", "tables", "deltaf_coefficients"):
        os.symlink(f"/root/reference/{name}", d / name)
    return str(d)


def _cli_env():
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.parametrize("operation", [1, 0])
def test_pod_cli_bit_identical_results(tmp_path, reference_dir, operation):
    """The SAME CLI command on every pod process (docs/MULTIHOST.md Level 4)
    must produce a results/ tree byte-identical to a single-process run --
    with a different device count, so this also re-proves sharding
    bit-stability through the full file pipeline.  The shipped parameter
    file has df_mode=3, so operation 1 drives the feqmod-partition pod path
    and operation 0 the feqmod dN/dX pod path."""
    args = ["mode=1", f"operation={operation}", "platform=cpu"]
    env = _cli_env()

    run_single = _make_run_dir(tmp_path / "single")
    out = subprocess.run(
        [sys.executable, "-m", "is3d_tpu", run_single, "host_devices=4"]
        + args, env=env, capture_output=True, timeout=600)
    assert out.returncode == 0, out.stdout.decode()[-2000:] + \
        out.stderr.decode()[-2000:]

    run_pod = _make_run_dir(tmp_path / "pod")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, "-m", "is3d_tpu", run_pod, "host_devices=2",
         f"multihost_coordinator=localhost:{port}", "multihost_nproc=2",
         f"multihost_pid={i}"] + args,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]

    def tree(root):
        out = []
        for d, _, files in os.walk(root):
            rel = os.path.relpath(d, root)
            out += [os.path.normpath(os.path.join(rel, f)) for f in files]
        return sorted(out)

    single_files = tree(os.path.join(run_single, "results"))
    pod_files = tree(os.path.join(run_pod, "results"))
    assert single_files == pod_files and single_files
    for name in single_files:
        with open(os.path.join(run_single, "results", name), "rb") as f:
            want = f.read()
        with open(os.path.join(run_pod, "results", name), "rb") as f:
            got = f.read()
        assert got == want, f"results/{name} differs between pod and single"
    # the averages side-channel is also written exactly once and identically
    for d in (run_single, run_pod):
        assert os.path.exists(
            os.path.join(d, "average_thermodynamic_quantities.dat"))


@pytest.mark.parametrize("decays", [0, 1], ids=["raw", "decays"])
def test_pod_sampler_byte_identical_merge(tmp_path, reference_dir, decays):
    """operation=2 in pod mode (round-4): each process samples a disjoint
    contiguous slice of the GLOBAL event range (streams keyed by global
    event index), writes a part file, and process 0 concatenates them --
    the merged particle_list_osc.dat must be BYTE-identical to the
    single-process run's (the reference's whole multi-machine story is
    process-parallel sampling, scripts/run_multithread_sampling_iS3D.py).
    With do_resonance_decays=1 (round-5) the MC cascade's lineage streams
    key on (global event, in-event ordinal, decay path), so the decayed
    merged list is byte-identical too -- no lane seeds, one shared decay
    stream."""
    # the toy 1-cell surface has a tiny mean yield, so oversampling hits the
    # max_num_samples cap exactly: both runs sample exactly 24 events
    args = ["mode=1", "operation=2", "platform=cpu", "oversample=1",
            "max_num_samples=24", "sampler_seed=7",
            f"do_resonance_decays={decays}", "test_sampler=0"]
    env = _cli_env()

    run_single = _make_run_dir(tmp_path / "single2")
    out = subprocess.run(
        [sys.executable, "-m", "is3d_tpu", run_single, "host_devices=1"]
        + args, env=env, capture_output=True, timeout=600)
    assert out.returncode == 0, out.stdout.decode()[-2000:] + \
        out.stderr.decode()[-2000:]

    run_pod = _make_run_dir(tmp_path / "pod2")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, "-m", "is3d_tpu", run_pod, "host_devices=1",
         f"multihost_coordinator=localhost:{port}", "multihost_nproc=2",
         f"multihost_pid={i}"] + args,
        env=_cli_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]

    with open(os.path.join(run_single, "results",
                           "particle_list_osc.dat"), "rb") as f:
        want = f.read()
    with open(os.path.join(run_pod, "results",
                           "particle_list_osc.dat"), "rb") as f:
        got = f.read()
    assert want and got == want
    # part files are cleaned up after the merge
    leftover = [f for f in os.listdir(os.path.join(run_pod, "results"))
                if ".part" in f]
    assert not leftover, leftover


def test_pod_test_sampler_histograms_identical(tmp_path, reference_dir):
    """test_sampler=1 in a pod (round-5): event slices are gathered to
    process 0 and binned as one global list, so every written validation
    histogram must be BYTE-identical to the single-process run's."""
    args = ["mode=1", "operation=2", "platform=cpu", "oversample=1",
            "max_num_samples=24", "sampler_seed=7", "test_sampler=1"]
    env = _cli_env()

    run_single = _make_run_dir(tmp_path / "single3")
    out = subprocess.run(
        [sys.executable, "-m", "is3d_tpu", run_single, "host_devices=1"]
        + args, env=env, capture_output=True, timeout=600)
    assert out.returncode == 0, out.stdout.decode()[-2000:] + \
        out.stderr.decode()[-2000:]

    run_pod = _make_run_dir(tmp_path / "pod3")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, "-m", "is3d_tpu", run_pod, "host_devices=1",
         f"multihost_coordinator=localhost:{port}", "multihost_nproc=2",
         f"multihost_pid={i}"] + args,
        env=_cli_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]

    def tree(root):
        out = []
        for d, _, files in os.walk(root):
            rel = os.path.relpath(d, root)
            out += [os.path.normpath(os.path.join(rel, f)) for f in files]
        return sorted(out)

    single_files = tree(os.path.join(run_single, "results"))
    pod_files = tree(os.path.join(run_pod, "results"))
    assert single_files == pod_files and single_files
    # the tree includes every per-species histogram file + yield_list.dat
    assert any("yield_list" in f for f in single_files)
    for name in single_files:
        with open(os.path.join(run_single, "results", name), "rb") as f:
            want = f.read()
        with open(os.path.join(run_pod, "results", name), "rb") as f:
            got = f.read()
        assert got == want, f"results/{name} differs between pod and single"
