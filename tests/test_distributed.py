"""True multi-process jax.distributed test: 2 processes x 4 CPU devices
form one 8-device mesh; a sharded env batch steps with collectives
crossing the process boundary, and both processes must agree on globally
reduced results (the SURVEY §4 'multi-host tests' gap)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, mode):
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", coordinator, str(tmp_path), mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out.decode())
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-3000:]


@pytest.mark.slow
def test_two_process_distributed_env_step(tmp_path):
    _run_workers(tmp_path, "step")
    # both processes observed identical global reductions
    vals = []
    for i in range(2):
        with open(tmp_path / f"proc{i}.txt") as f:
            vals.append([float(x) for x in f.read().split()])
    np.testing.assert_allclose(vals[0], vals[1], rtol=0, atol=0)
    assert all(np.isfinite(vals[0]))


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    """The real multi-host learner path: ppo.train across 2 processes on
    one global mesh — both must end with IDENTICAL replicated params
    (gradients all-reduced across the process boundary)."""
    _run_workers(tmp_path, "train")
    vals = []
    for i in range(2):
        with open(tmp_path / f"train{i}.txt") as f:
            vals.append([float(x) for x in f.read().split()])
    np.testing.assert_allclose(vals[0], vals[1], rtol=0, atol=0)
    assert all(np.isfinite(vals[0]))
