"""Whole-unroll fused kernel: T policy+env steps in ONE pallas call.

The r4 on-chip cost structure (docs/ROADMAP.md "r4 per-step cost
structure") showed the per-step wall time on this backend is ~1 ms per
XLA scan iteration nearly independent of the body — the wrapped-step
kernel itself costs ~50 us @4096 envs while a `lax.scan` over it runs at
~1.1 ms/iter, and even a trivial elementwise scan body measures ~0.5
ms/iter (dev/probe_launch_overhead.py). The scan-lane rollout
(puppax/env/rollout.py) therefore pays T scan-iteration taxes per
unroll. This module removes the scan entirely:

* ONE ``pallas_call`` with ``grid=(num_tiles, T)`` runs the whole
  unroll. T is the innermost (fastest) grid dimension, so for each batch
  tile the kernel executes steps t=0..T-1 back to back; the carried
  state (qpos/qvel rows, env-state block, episode bookkeeping, gait
  phase) lives in the carry OUTPUT refs, whose block index is constant
  in t — pallas keeps a revisited block resident in VMEM across grid
  steps and flushes it to HBM once per tile;
* the policy MLP runs INSIDE the kernel: observation rows are assembled
  from the carried env-state block, pushed through the (folded)
  normalizer + dense layers on the MXU, and the NormalTanh head samples
  with pre-drawn eps rows — matching networks.make_inference_fn +
  NormalTanhDistribution math exactly (puppax/env/rollout.py
  policy_rows);
* the observation normalizer is FOLDED into the first dense layer
  (W' = W/std, b' = b - W' @ mean) — the same fold the policy export
  path applies (puppax/export/params.py), so the kernel consumes plain
  weight matrices;
* per-step randomness (env noise rows, policy sampling eps) streams in
  as t-indexed input blocks, pre-drawn on the bit-identical per-env
  threefry chains by the fast lane (rollout.FastLane.draw_noise_block);
* per-step outputs (policy obs, action, raw action, log_prob, aux rows)
  stream out as t-indexed output blocks.

The env-step math is the SAME emission as the per-step wrapped kernel
(soa_env._emit_wrapped_step — reference environment.py:348-483 plus the
Episode/AutoReset wrapper algebra); this module only adds the in-kernel
policy and the grid/carry plumbing. The pure-XLA oracle for the fused
math is rollout.FastLane's xla mode with the folded policy
(tests/test_fused_unroll.py); the grid/carry plumbing is pinned by a
mock-kernel interpret test and the on-device worker.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from puppax.env import soa_env
from puppax.physics import soa
from puppax.physics.soa import LANE, SUB, materialize

TWO_PI = 2.0 * np.pi
MIN_STD = 0.001
LOG2 = 0.6931471805599453


def fold_normalizer(normalizer, params) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """(normalizer_state, flax MLP params) -> [(W_t, b)] dense layers with
    the running-statistics normalization folded into layer 0:

        h0 = W0.T @ ((x - mean) / std) + b0  ==  W0'.T_x @ x + b0'
        W0' = W0.T / std[None, :],  b0' = b0 - W0' @ mean

    W_t is (out, in) — already transposed for feature-major apply. Same
    fold as the export path (puppax/export/params.py), so the kernel and
    the exported policy share the algebra.
    """
    layers = []
    pdict = params["params"]
    for i in range(len(pdict)):
        lp = pdict[f"hidden_{i}"]
        w_t = lp["kernel"].T.astype(jnp.float32)  # (out, in)
        b = lp["bias"].astype(jnp.float32)
        if i == 0 and normalizer is not None:
            std = normalizer.std.astype(jnp.float32)
            mean = normalizer.mean.astype(jnp.float32)
            w_t = w_t / std[None, :]
            b = b - w_t @ mean
        layers.append((w_t, b))
    return layers


def policy_math(loc_rows, scale_param_rows, eps_rows):
    """NormalTanh head on row values (shape-agnostic — works on (SUB,
    LANE) kernel tiles and flat (Bp,) oracle rows alike): returns
    (action_rows, pre_tanh_rows, log_prob_value). Matches
    NormalTanhDistribution exactly (same reductions as
    rollout.FastLane.policy_rows)."""
    act_rows, raw_rows = [], []
    logp = None
    for loc, sp, eps in zip(loc_rows, scale_param_rows, eps_rows):
        scale = jax.nn.softplus(sp) + MIN_STD
        pre_tanh = loc + scale * eps
        act_rows.append(jnp.tanh(pre_tanh))
        raw_rows.append(pre_tanh)
        normal_lp = (
            -0.5 * jnp.square((pre_tanh - loc) / scale)
            - jnp.log(scale)
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )
        fldj = 2.0 * (LOG2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
        term = normal_lp - fldj
        logp = term if logp is None else logp + term
    return act_rows, raw_rows, logp


def mlp_rows_flat(layers, activation, x):
    """Folded MLP on a feature-major matrix x (in_dim, B): the oracle /
    xla-mode apply. One GEMM per layer."""
    for i, (w_t, b) in enumerate(layers):
        x = (
            jax.lax.dot_general(
                w_t, x, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + b[:, None]
        )
        if i != len(layers) - 1:
            x = activation(x)
    return x


def mlp_rows_tiles(w_vals, b_vals, activation, X):
    """Folded MLP on an (in_dim, SUB, LANE) tile slab, inside the kernel:
    per-sublane-slice GEMMs on the MXU, restacked to (out, SUB, LANE)."""
    n_layers = len(w_vals)
    outs = []
    for si in range(SUB):
        x = X[:, si, :]  # (in_dim, LANE)
        for i in range(n_layers):
            x = (
                jax.lax.dot_general(
                    w_vals[i], x, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                + b_vals[i]
            )
            if i != n_layers - 1:
                x = activation(x)
        outs.append(x)
    return jnp.stack(outs, axis=1)  # (out_dim, SUB, LANE)


def build_unroll_kernel(
    s: soa._Static,
    es: soa_env._EnvStatic,
    n_substeps: int,
    episode_length: int,
    T: int,
    layer_shapes: Sequence[Tuple[int, int]],
    gait: bool,
    dphase: float,
    activation,
):
    """Build the fused-unroll kernel function + its pallas_call wrapper.

    Returns ``run(q0, v0, env0, wrap0, phase0, first, dr, noise, eps,
    weights) -> (qf, vf, envf, wrapf, phasef, obs_ts, act_ts, raw_ts,
    logp_ts, aux_ts)`` on tile-layout arrays; ``phase0``/``phasef`` are
    present only when ``gait``. ``weights`` is the fold_normalizer output
    flattened as (w0, b0, w1, b1, ...), with biases shaped (out, 1).
    """
    nq, nv, nu = s.nq, s.nv, s.nu
    nenv, nnoise, ndr = es.nenv_rows, es.nnoise_rows, s.ndr
    nfirst = nq + nv + es.hist + es.npriv
    aux_rows = soa_env.aux_row_map(es)
    naux = sum(n for _, n in aux_rows.values())
    obs_r0, obs_n = es.env_rows["obs_history"]
    obs_dim = es.hist + (2 if gait else 0)
    n_layers = len(layer_shapes)

    # ref layout: inputs then outputs, parsed positionally
    n_in = 8 + (1 if gait else 0) + 2 * n_layers  # carry inits..eps + weights
    n_carry_out = 4 + (1 if gait else 0)

    def kernel(*refs):
        (q0_ref, v0_ref, env0_ref, wrap0_ref), k = refs[:4], 4
        if gait:
            phase0_ref, k = refs[k], k + 1
        first_ref, dr_ref, noi_ref, eps_ref = refs[k : k + 4]
        k += 4
        w_refs = refs[k : k + 2 * n_layers]
        k += 2 * n_layers
        assert k == n_in
        (qc_ref, vc_ref, envc_ref, wrapc_ref), k2 = refs[k : k + 4], k + 4
        if gait:
            phasec_ref, k2 = refs[k2], k2 + 1
        obs_ref, act_ref, raw_ref, logp_ref, aux_ref = refs[k2 : k2 + 5]

        t = pl.program_id(1)

        # t == 0: load this tile's entry state into the carry refs (their
        # block index is constant in t, so the block stays VMEM-resident
        # across t and flushes to HBM once per tile)
        @pl.when(t == 0)
        def _init():
            qc_ref[...] = q0_ref[...]
            vc_ref[...] = v0_ref[...]
            envc_ref[...] = env0_ref[...]
            wrapc_ref[...] = wrap0_ref[...]
            if gait:
                phasec_ref[...] = phase0_ref[...]

        # ---- policy obs from the carried env block -----------------------
        X = envc_ref[obs_r0 : obs_r0 + obs_n]  # (hist, SUB, LANE)
        if gait:
            phase = phasec_ref[0]
            X = jnp.concatenate(
                [X, jnp.cos(phase)[None], jnp.sin(phase)[None]], axis=0
            )

        # ---- policy MLP + NormalTanh head --------------------------------
        w_vals = [w_refs[2 * i][...] for i in range(n_layers)]
        b_vals = [w_refs[2 * i + 1][...] for i in range(n_layers)]
        H = mlp_rows_tiles(w_vals, b_vals, activation, X)
        eps3 = eps_ref[0]  # (nu, SUB, LANE)
        loc_rows = [H[i] for i in range(nu)]
        sp_rows = [H[nu + i] for i in range(nu)]
        eps_rows = [eps3[i] for i in range(nu)]
        act, raw, logp = policy_math(loc_rows, sp_rows, eps_rows)

        # ---- the wrapped env step (same emission as the per-step kernel) -
        q = [qc_ref[i] for i in range(nq)]
        v = [vc_ref[i] for i in range(nv)]
        env = {
            name: [envc_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in es.env_rows.items()
        }
        noi3 = noi_ref[0]
        noi = {
            name: [noi3[r0 + i] for i in range(n)]
            for name, (r0, n) in es.noise_rows.items()
        }
        dr = {
            name: [dr_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in s.dr_rows.items()
        }
        first_q = [first_ref[i] for i in range(nq)]
        first_v = [first_ref[nq + i] for i in range(nv)]
        first_obs = [first_ref[nq + nv + i] for i in range(es.hist)]
        first_priv = [
            first_ref[nq + nv + es.hist + i] for i in range(es.npriv)
        ]
        steps = wrapc_ref[0]
        prev_done = wrapc_ref[1]
        ref = q[0]

        q_out, v_out, env_out, steps2, done2, aux = soa_env._emit_wrapped_step(
            s, es, q, v, act, env, noi, dr, first_q, first_v, first_obs,
            first_priv, steps, prev_done, n_substeps, episode_length,
        )

        # ---- per-step streamed outputs -----------------------------------
        obs_ref[0] = X
        for i in range(nu):
            act_ref[0, i] = materialize(act[i], ref)
            raw_ref[0, i] = materialize(raw[i], ref)
        logp_ref[0, 0] = materialize(logp, ref)
        for name, (r0, n) in aux_rows.items():
            vals = aux[name]
            for i in range(n):
                aux_ref[0, r0 + i] = materialize(vals[i], ref)

        # ---- write back the carry ----------------------------------------
        for i in range(nq):
            qc_ref[i] = materialize(q_out[i], ref)
        for i in range(nv):
            vc_ref[i] = materialize(v_out[i], ref)
        for name, (r0, n) in es.env_rows.items():
            vals = env_out[name]
            for i in range(n):
                envc_ref[r0 + i] = materialize(vals[i], ref)
        wrapc_ref[0] = materialize(steps2, ref)
        wrapc_ref[1] = materialize(done2, ref)
        if gait:
            # free-running clock restarted on the EFFECTIVE done
            # (wrappers.py:148-157; rollout._unroll_local body order: the
            # obs above used the PRE-tick phase)
            done_v = materialize(done2, ref)
            ticked = jnp.mod(phase + dphase, TWO_PI)
            phasec_ref[0] = jnp.where(done_v > 0.5, 0.0, ticked)

    def run(q0, v0, env0, wrap0, phase0, first, dr, noise, eps, weights,
            interpret: bool = False):
        nbp = q0.shape[1]  # Bp // LANE
        nb = nbp // SUB
        dtype = jnp.float32

        def tile_spec(rows):
            return pl.BlockSpec(
                (rows, SUB, LANE), lambda i, t: (0, i, 0),
                memory_space=pltpu.VMEM,
            )

        def t_spec(rows):
            return pl.BlockSpec(
                (1, rows, SUB, LANE), lambda i, t: (t, 0, i, 0),
                memory_space=pltpu.VMEM,
            )

        def w_spec(shape):
            zeros = (0,) * len(shape)
            return pl.BlockSpec(
                shape, lambda i, t, _z=zeros: _z, memory_space=pltpu.VMEM
            )

        def tile_shape(rows):
            return jax.ShapeDtypeStruct((rows, nbp, LANE), dtype)

        def t_shape(rows):
            return jax.ShapeDtypeStruct((T, rows, nbp, LANE), dtype)

        in_specs = [tile_spec(nq), tile_spec(nv), tile_spec(nenv),
                    tile_spec(2)]
        operands = [q0, v0, env0, wrap0]
        if gait:
            in_specs.append(tile_spec(1))
            operands.append(phase0)
        in_specs += [tile_spec(nfirst), tile_spec(ndr),
                     t_spec(nnoise), t_spec(nu)]
        operands += [first, dr, noise, eps]
        for w in weights:
            in_specs.append(w_spec(w.shape))
            operands.append(w)

        out_specs = [tile_spec(nq), tile_spec(nv), tile_spec(nenv),
                     tile_spec(2)]
        out_shape = [tile_shape(nq), tile_shape(nv), tile_shape(nenv),
                     tile_shape(2)]
        if gait:
            out_specs.append(tile_spec(1))
            out_shape.append(tile_shape(1))
        out_specs += [t_spec(obs_dim), t_spec(nu), t_spec(nu), t_spec(1),
                      t_spec(naux)]
        out_shape += [t_shape(obs_dim), t_shape(nu), t_shape(nu),
                      t_shape(1), t_shape(naux)]

        return pl.pallas_call(
            kernel,
            grid=(nb, T),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(*operands)

    return run
