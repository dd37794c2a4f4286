"""Census of the wrapped-step emission: jaxpr equation counts by primitive.

Traces soa_env.wrapped_step_rows_xla (the SAME program the pallas kernel
lowers — value algebra is shape-agnostic) for the flat env and prints the
primitive histogram. Used to measure op-count reductions (trace-time CSE,
dead-row elimination) — docs/ROADMAP.md r4 "emission op census" baseline:
~43k eqs (mul 21.5k, add 10.8k, sub 4.8k, neg 1.3k) before CSE.

PUPPAX_CENSUS_CSE=off disables the CSE memo for the A/B.
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from puppax.configs import get_config  # noqa: E402
from puppax.env import PupperV3Env, soa_env  # noqa: E402
from puppax.physics import soa  # noqa: E402


def count_eqs(jaxpr, ctr):
    for eq in jaxpr.eqns:
        ctr[eq.primitive.name] += 1
        for p in eq.params.values():
            if hasattr(p, "jaxpr"):
                count_eqs(p.jaxpr, ctr)
            if isinstance(p, (list, tuple)):
                for pp in p:
                    if hasattr(pp, "jaxpr"):
                        count_eqs(pp.jaxpr, ctr)


def main():
    if os.environ.get("PUPPAX_CENSUS_CSE") == "off":
        # disable the memo: emissions run exactly as pre-r5
        soa._CSE_ENABLED = False

    env = PupperV3Env(
        path=None,
        reward_config=get_config(),
        action_scale=0.75,
        observation_history=2,
        maximum_pitch_command=10.0,
        maximum_roll_command=10.0,
    )
    core = env._cv_core
    s, es = core._s, core._es
    B = 8
    n_dr = sum(n for _, n in s.dr_rows.values())
    nfirst = s.nq + s.nv + es.hist + es.npriv

    def step(q, v, act, env_r, noi, dr, first, wrap):
        return soa_env.wrapped_step_rows_xla(
            s, es, env._n_substeps, 1000, q, v, act, env_r, noi, dr,
            first, wrap,
        )

    shapes = [
        (s.nq, B), (s.nv, B), (s.nu, B), (es.nenv_rows, B),
        (es.nnoise_rows, B), (n_dr, B), (nfirst, B), (2, B),
    ]
    args = [jnp.zeros(sh, jnp.float32) for sh in shapes]
    jaxpr = jax.make_jaxpr(step)(*args)
    ctr = collections.Counter()
    count_eqs(jaxpr.jaxpr, ctr)
    total = sum(ctr.values())
    print(f"total eqs: {total}")
    for name, n in ctr.most_common(20):
        print(f"  {name:20s} {n}")


if __name__ == "__main__":
    main()
