"""On-device (TPU) numerics parity, promoted from dev/check_tpu_numerics.py.

Gated on a real accelerator: the suite itself is pinned to CPU by
conftest.py, so this test re-execs a worker subprocess with the default
platform resolution and skips unless that worker lands on a non-cpu
backend. Run explicitly with: pytest -m tpu tests/test_tpu_numerics.py
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.tpu
@pytest.mark.slow
def test_on_device_numerics():
    worker = os.path.join(os.path.dirname(__file__), "tpu_numerics_worker.py")
    env = dict(os.environ)
    # undo the suite's CPU device-count flag but KEEP the platform pin
    # (JAX_PLATFORMS) and PYTHONPATH: on accelerator images those carry the
    # device-plugin registration; conftest's CPU override is in-process only
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, worker],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    if result["backend"] == "cpu":
        pytest.skip("no accelerator present (worker resolved to cpu)")
    # (1) matmul-precision invariants hold: no NaNs in 60 random steps
    assert result["nan_step"] == -1, f"NaNs at step {result['nan_step']}"
    # (2) single zero-action step agrees with CPU at f32-ulp scale
    assert result["d_q"] < 5e-6, result
    assert result["d_obs"] < 1e-4, result
