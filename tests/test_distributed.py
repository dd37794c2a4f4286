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


@pytest.mark.slow
def test_two_process_training_via_cli(tmp_path):
    """VERDICT r1 item 3: the PRODUCTION entry point (scripts/train.py +
    parallel.maybe_initialize_distributed reading COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID) forms a real 2-process mesh and both
    processes finish with identical training/eval metrics — proving the
    CLI path does not silently run single-host (the r1 bootstrap bug)."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "train.py")
    coordinator = f"localhost:{_free_port()}"
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["COORDINATOR_ADDRESS"] = coordinator
        env["NUM_PROCESSES"] = "2"
        env["PROCESS_ID"] = str(i)
        env["PUPPAX_TEST_CACHE"] = os.environ.get(
            "PUPPAX_TEST_CACHE", "/tmp/puppax_xla_cache"
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, script, "--platform", "cpu",
                    "--set", "train.num_timesteps=256",
                    "--set", "train.num_envs=8",
                    "--set", "train.episode_length=16",
                    "--set", "train.unroll_length=4",
                    "--set", "train.batch_size=4",
                    "--set", "train.num_minibatches=2",
                    "--set", "train.num_updates_per_batch=1",
                    "--set", "train.num_evals=2",
                    "--set", "train.num_eval_envs=8",
                    "--set", f"train.metrics_jsonl={tmp_path}/metrics{i}.jsonl",
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outputs.append(out.decode())
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-4000:]

    # both processes print the same final metrics JSON (walltime/sps are
    # host-local and excluded)
    finals = []
    for out in outputs:
        start = out.index("{\n") if "{\n" in out else out.index("{")
        metrics = json.loads(out[start:])
        metrics = {
            k: v for k, v in metrics.items()
            if "walltime" not in k and "sps" not in k and "time" not in k
        }
        finals.append(metrics)
    assert finals[0].keys() == finals[1].keys()
    for k in finals[0]:
        np.testing.assert_allclose(
            finals[0][k], finals[1][k], rtol=0, atol=0, err_msg=k
        )
    # only the lead process writes metrics (multi-host write gating)
    assert os.path.exists(tmp_path / "metrics0.jsonl")
    assert not os.path.exists(tmp_path / "metrics1.jsonl")
