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


def test_multihost_kernels_bit_identical(tmp_path):
    """Every multi-host kernel path (smooth VH spectra, VAH spectra, spin
    polarization, dN/dX) on a 2-process x 2-device pod must be bit-identical
    to the in-process single-host computation on every process."""
    from _multihost_worker import compute_inprocess
    ref = compute_inprocess()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # APPEND to PYTHONPATH (a TPU plugin may load via an existing entry's
    # sitecustomize; replacing the path breaks backend init entirely)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", port, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]

    for i in range(2):
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
