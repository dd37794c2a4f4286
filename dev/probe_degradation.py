"""Bisect which setup stage triggers the tunneled-TPU degraded-dispatch
mode (~27 ms per dispatch after any device->host read).

Measures a trivial pallas-copy 50-step scan AFTER each setup stage in ONE
process; the stage that jumps the per-step cost from ~2 us to ~500 us is
the culprit. Stage selected by argv so each run is a fresh process:

  0 nothing (baseline)
  1 import puppax.env + configs
  2 build RobotModel (PupperV3Env model load only)
  3 full PupperV3Env ctor
  4 env + soa._Static
  5 env + dr_inputs
  6 env + wrapped reset (jit vmap reset)

Usage: python dev/probe_degradation.py <stage>
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

SUB, LANE, TILE_B = 8, 128, 1024
B = 4096
Bp = B
nb = Bp // TILE_B
NQ = 19
ITERS = 50

stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0

if stage >= 1:
    from puppax.configs import get_config
    from puppax.env import PupperV3Env
    from puppax.physics import soa
if stage == 2:
    from puppax.model import assets, mjcf

    model, mj_model = mjcf.load_model(assets.pupper_xml_path())
if stage >= 3:
    env = PupperV3Env(path=None, reward_config=get_config(),
                      action_scale=0.75, observation_history=2)
if stage >= 4 and stage != 5:
    if stage >= 4:
        s = soa._Static(env.model, env.mj_model)
if stage == 5:
    s = soa._Static(env.model, env.mj_model)
    dr = soa.dr_inputs(env.model, s, B)
if stage == 6:
    from puppax.env import wrappers

    w = wrappers.wrap_for_training(env, episode_length=1000)
    st = jax.jit(w.reset)(jax.random.split(jax.random.PRNGKey(0), 64))
    jax.block_until_ready(st.obs)
if stage == 7:
    import numpy as np

    _ = np.array(env.model.qpos0)  # device leaf -> host: the suspect
if stage == 8:
    from puppax.env import wrappers

    w = wrappers.wrap_for_training(env, episode_length=1000)  # wrap only
if stage == 9:
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 64)
    )
    jax.block_until_ready(st.obs)
if stage == 10:
    st = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), 64))
    jax.block_until_ready(st.obs)
if stage == 11:
    # single-env reset, jitted
    st = jax.jit(env.reset)(jax.random.PRNGKey(0))
    jax.block_until_ready(st.obs)


def copy_kernel(q_ref, qo):
    for i in range(NQ):
        qo[i] = q_ref[i] + 1e-7


def spec(rows):
    return pl.BlockSpec((rows, SUB, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def kcall(q):
    return pl.pallas_call(
        copy_kernel, grid=(nb,),
        in_specs=[spec(NQ)],
        out_specs=spec(NQ),
        out_shape=jax.ShapeDtypeStruct((NQ, Bp // LANE, LANE), jnp.float32),
    )(q)


def scan_pallas(q):
    def body(c, _):
        return kcall(c), ()

    out, _ = jax.lax.scan(body, q, (), length=ITERS)
    return out


q_t = jnp.zeros((NQ, Bp // LANE, LANE), jnp.float32)
jfn = jax.jit(scan_pallas)
out = jfn(q_t)
jax.block_until_ready(out)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    out = jfn(q_t)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"stage {stage}: {best / ITERS * 1e6:9.1f} us/step", flush=True)

# stage 7: the profile scripts' own np.array(device leaf) D2H
