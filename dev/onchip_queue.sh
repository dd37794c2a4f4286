#!/bin/bash
# On-chip validation queue for when the TPU tunnel returns
# (docs/ROADMAP.md "When the TPU tunnel returns"). Run from the repo root.
#
# Each stage logs its FULL output plus an explicit exit-status trailer to
# dev/onchip_logs/ (ADVICE r2: a killed run must not leave an
# undiagnosable two-character log). The tpu test tier runs one pytest
# invocation PER test file so a timeout in one worker still leaves the
# other files' results on disk. The script stops on first failure so a
# wedged tunnel never queues further compiles behind a dead one.
set -e
cd "$(dirname "$0")/.."
mkdir -p dev/onchip_logs

run_stage() {
  # run_stage <name> <timeout_s> <cmd...>
  local name="$1" budget="$2"
  shift 2
  local log="dev/onchip_logs/${name}.log"
  echo "== ${name} (timeout ${budget}s) =="
  local rc=0
  timeout "$budget" "$@" >"$log" 2>&1 || rc=$?
  echo "[onchip_queue] exit=${rc} $(date -u +%FT%TZ) cmd: $*" >>"$log"
  tail -5 "$log"
  if [ "$rc" -ne 0 ]; then
    echo "== ${name} FAILED (exit ${rc}; 124=timeout) — see ${log} =="
    exit "$rc"
  fi
}

run_stage probe 240 python -c "import jax, jax.numpy as jnp; print(jax.default_backend(), jnp.arange(8.).sum())"

# on-device kernel tests, one file at a time (each worker subprocess can
# take ~15-45 min of tunneled compiles; see tests/test_soa_env.py timeout)
run_stage tpu_soa      3600 python -m pytest tests/test_soa.py -q -m tpu -rA
run_stage tpu_soa_env 12000 python -m pytest tests/test_soa_env.py -q -m tpu -rA
run_stage tpu_numerics 1800 python -m pytest tests/test_tpu_numerics.py -q -m tpu -rA
run_stage tpu_rollout  3600 python -m pytest tests/test_rollout.py -q -m tpu -rA

run_stage numerics 900 python dev/check_tpu_numerics.py

run_stage bench 7200 python bench.py

echo "== done; see dev/onchip_logs/ =="
