"""puppax — a TPU-native quadruped locomotion RL framework.

A from-scratch JAX/XLA re-design of the capability set of the reference
``pupperv3_mjx`` package (rishihahs/pupperv3-mjx): a pure-JAX fixed-topology
rigid-body physics engine with MuJoCo semantics, a batched Pupper v3 joystick
locomotion environment, domain randomization, a mesh-sharded PPO learner, and
the policy-export deployment ABI.

Layer map (mirrors reference SURVEY §1, all five layers owned here):
  L1 model/    — MJCF compile (host-side mujoco, once) -> numeric pytree
  L2 physics/  — pure-JAX rigid body engine (FK, CRB, RNE, contacts, Newton)
  L3 env/      — batched env runtime (State pytree, auto-reset, episode)
  L4 env/pupper.py — the PupperV3 joystick environment
  L5 train/ export/ tools/ — PPO learner, checkpoints, export, logging
"""

__version__ = "0.1.0"
