"""Per-phase physics timing at batch B on the current backend.

Each phase is timed as a jitted scan of `iters` applications so dispatch
overhead amortizes (the tunneled TPU has high per-call latency).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from puppax.configs import get_config
from puppax.env import PupperV3Env
from puppax.ops import linalg
from puppax.physics import collision, constraint, smooth, solver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = 20

env = PupperV3Env(path=None, reward_config=get_config(), action_scale=0.75,
                  observation_history=2)
m = env.model

key = jax.random.PRNGKey(0)
qpos = jnp.tile(m.key_qpos, (B, 1)) + 0.01 * jax.random.normal(key, (B, m.nq))
qvel = 0.1 * jax.random.normal(key, (B, m.nv))
ctrl = jnp.tile(env._default_pose, (B, 1))

kin = jax.jit(jax.vmap(lambda q: smooth.kinematics(m, q)))(qpos)
com = jax.jit(jax.vmap(lambda k: smooth.com_pos(m, k)))(kin)
vel = jax.jit(jax.vmap(lambda c, v: smooth.com_vel(m, c, v)))(com, qvel)
qM = jax.jit(jax.vmap(lambda c: smooth.crb(m, c)))(com)
contacts = jax.jit(jax.vmap(lambda k: collision.collide(m, k)))(kin)
efc = jax.jit(jax.vmap(lambda c, q, v, ct: constraint.make_efc(m, c, q, v, ct)))(
    com, qpos, qvel, contacts)
qfrc = jax.random.normal(key, (B, m.nv))
qacc_smooth = jax.jit(jax.vmap(lambda M, f: linalg.spd_solve(M, f)))(qM, qfrc)


def bench(name, fn, *args):
    vm = jax.vmap(fn)

    def loop(args):
        def body(carry, i):
            a, acc = carry
            # perturb the first leaf so XLA cannot hoist the body out of
            # the loop; fold outputs into a scalar so they are not dead
            leaves, treedef = jax.tree_util.tree_flatten(a)
            leaves = [leaves[0] * (1.0 + i.astype(leaves[0].dtype) * 1e-20)] + list(
                leaves[1:]
            )
            out = vm(*jax.tree_util.tree_unflatten(treedef, leaves))
            s = sum(
                jnp.sum(x)
                for x in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(x.dtype, jnp.floating)
            )
            return (a, acc + s), ()

        (_, acc), _ = jax.lax.scan(body, (args, 0.0), jnp.arange(ITERS))
        return acc

    jl = jax.jit(loop)
    out = jl(args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jl(args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS * 1e3
    print(f"{name:18s} {per:8.3f} ms/iter @ B={B}")


bench("kinematics", lambda q: smooth.kinematics(m, q), qpos)
bench("com_pos", lambda k: smooth.com_pos(m, k), kin)
bench("com_vel", lambda c: smooth.com_vel(m, c, qvel[0] * 0), com)
bench("crb", lambda c: smooth.crb(m, c), com)
bench("rne", lambda c, v: smooth.rne(m, c, v, qvel[0] * 0), com, vel)
bench("actuation", lambda q, v: smooth.actuation(m, q, v, ctrl[0] * 0), qpos, qvel)
bench("spd_solve", lambda M, f: linalg.spd_solve(M, f), qM, qfrc)
bench("collide", lambda k: collision.collide(m, k), kin)
bench("make_efc", lambda c, q, v, ct: constraint.make_efc(m, c, q, v, ct),
      com, qpos, qvel, contacts)
bench("newton_solve", lambda M, a, e: solver.solve(m, M, a, e).qacc,
      qM, qacc_smooth, efc)
