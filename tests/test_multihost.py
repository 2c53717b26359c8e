"""Multi-host (2-process) data-parallel integration test.

Two real OS processes, 4 virtual CPU devices each, form one 8-device global
mesh through jax.distributed; each drives the full multi-host path
(initialize_distributed -> create_mesh -> per-host sharded loader -> fused
sharded train steps).  After 3 steps the replicated parameters, EMA shadow
and reported losses must be identical across processes — the executable proof
behind parallel/distributed.py's multi-host claim (the reference has no
multi-device path at all, SURVEY.md §2.11).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
GSPMD_WORKER = os.path.join(REPO, "tests", "multihost_gspmd_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # the TPU-tunnel sitecustomize (on PYTHONPATH) force-registers the remote
    # TPU backend in every subprocess; drop it so workers run on CPU
    env.pop("PYTHONPATH", None)
    return env


@pytest.mark.slow
def test_two_process_training_stays_in_sync(tmp_path):
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), str(tmp_path)],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = []
    for pid in (0, 1):
        with open(tmp_path / f"losses_{pid}.json") as f:
            losses.append(json.load(f))
    assert np.all(np.isfinite(np.asarray(losses)))
    # global-batch loss means are identical on both hosts
    np.testing.assert_array_equal(np.asarray(losses[0]),
                                  np.asarray(losses[1]))

    for name in ("gparams", "dparams", "shadow"):
        a = np.load(tmp_path / f"{name}_0.npy")
        b = np.load(tmp_path / f"{name}_1.npy")
        assert a.shape == b.shape and a.size > 0
        # replicated state must never diverge across processes (same pmean'd
        # grads -> bitwise-identical Adam updates)
        np.testing.assert_array_equal(a, b, err_msg=name)
        assert np.all(np.isfinite(a)), name


@pytest.mark.slow
def test_two_process_gspmd_training_stays_in_sync(tmp_path):
    """The 2-D (data x spatial) GSPMD step across a real process boundary:
    each host owns one data row (its images split over height on its own 4
    devices), logistic+R1 — replicated parameters and global-batch losses
    must come out identical on both hosts."""
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, GSPMD_WORKER, str(port), str(pid), str(tmp_path)],
        cwd=REPO, env=_env(), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"gspmd worker failed:\n{out}"

    losses = []
    for pid in (0, 1):
        with open(tmp_path / f"gspmd_losses_{pid}.json") as f:
            losses.append(json.load(f))
    assert np.all(np.isfinite(np.asarray(losses)))
    np.testing.assert_array_equal(np.asarray(losses[0]),
                                  np.asarray(losses[1]))

    for name in ("gspmd_gparams", "gspmd_dparams", "gspmd_shadow"):
        a = np.load(tmp_path / f"{name}_0.npy")
        b = np.load(tmp_path / f"{name}_1.npy")
        assert a.shape == b.shape and a.size > 0
        np.testing.assert_array_equal(a, b, err_msg=name)
        assert np.all(np.isfinite(a)), name
