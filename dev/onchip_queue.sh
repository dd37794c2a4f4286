#!/bin/bash
# On-chip validation queue for when the TPU tunnel returns
# (docs/ROADMAP.md "When the TPU tunnel returns"). Run from the repo root.
# Each stage logs to dev/onchip_logs/ and the script stops on first failure
# so a wedged tunnel never queues further compiles behind a dead one.
set -e
cd "$(dirname "$0")/.."
mkdir -p dev/onchip_logs

echo "== probe =="
timeout 90 python -c "import jax, jax.numpy as jnp; print(jax.default_backend(), jnp.arange(8.).sum())"

echo "== on-device kernel tests (pytest -m tpu) =="
timeout 5400 python -m pytest tests/ -q -m tpu 2>&1 | tee dev/onchip_logs/tpu_tests.log | tail -5

echo "== numerics probe =="
timeout 900 python dev/check_tpu_numerics.py 2>&1 | tee dev/onchip_logs/numerics.log | tail -3

echo "== bench (all configs) =="
timeout 5400 python bench.py 2> >(tee dev/onchip_logs/bench_err.log >&2) | tee dev/onchip_logs/bench.log

echo "== done; see dev/onchip_logs/ =="
