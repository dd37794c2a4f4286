"""Policy export: trained params -> JSON dict for the on-robot controller.

This is the deployment ABI (reference /root/reference/pupperv3_mjx/
export.py:13-81): the exported dict must let the robot's C++ runtime
replay the policy bit-for-bit, so

* the running-normalizer mean/std are folded into the first dense layer
  (obs_norm = (x - mu) / sigma followed by W.T x + b becomes a single
  affine layer: W' = W / sigma[:, None], b' = b - W.T (mu / sigma)), and
* the final layer keeps only the mean (loc) half of the (loc, scale)
  Gaussian head, squashed by the final activation (tanh) on-robot.

``params`` is ``(normalizer_state, policy_params)`` where policy_params is
the flax ``{"params": {"hidden_i": {kernel, bias}}}`` tree produced by
``puppax.train.networks`` — layer iteration order is the layer order.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def fold_in_normalization(kernel, bias, mean, std):
    """Fold (x - mean) / std into a dense layer's kernel/bias
    (reference export.py:7-10 semantics)."""
    kernel = np.asarray(kernel)
    bias = np.asarray(bias)
    mean = np.asarray(mean)
    std = np.asarray(std)
    folded_kernel = kernel / std[:, None]
    folded_bias = bias - kernel.T @ (mean / std)
    return folded_kernel, folded_bias


def convert_params(
    params,
    activation: str,
    action_scale: float,
    kp: float,
    kd: float,
    default_pose,
    joint_upper_limits,
    joint_lower_limits,
    use_imu: bool,
    observation_history: int,
    maximum_pitch_command: float,
    maximum_roll_command: float,
    final_activation: str = "tanh",
    gait_phase_observation: bool = False,
    gait_frequency: float = 0.0,
    control_dt: float = 0.02,
) -> Dict:
    """Convert PPO params to the on-robot JSON policy dict (the ABI of
    reference export.py:13-81: same keys, same layer schema).

    Policies trained with the gait clock (env.gait_phase_observation)
    additionally carry ``gait_phase_observation`` / ``gait_frequency`` /
    ``control_dt`` so the on-robot controller knows to append the
    free-running (cos, sin) clock after the obs history — the native
    runtime (native/policy_runtime.cc) honors these keys."""
    normalizer, policy_params = params[0], params[1]
    mean = np.asarray(normalizer.mean)
    std = np.asarray(normalizer.std)

    layer_items = list(policy_params["params"].items())
    layers = []
    input_size = None
    for i, (_name, layer) in enumerate(layer_items):
        kernel = np.asarray(layer["kernel"])
        bias = np.asarray(layer["bias"])
        if i == 0:
            kernel, bias = fold_in_normalization(kernel, bias, mean, std)
            input_size = kernel.shape[0]
        if i == len(layer_items) - 1:
            # keep only the mean head of the (loc, scale) Gaussian output
            half = bias.shape[-1] // 2
            kernel, bias = kernel[:, :half], bias[:half]
        layers.append(
            {
                "type": "dense",
                "activation": activation if i < len(layer_items) - 1 else final_activation,
                "shape": [None, int(bias.shape[-1])],
                "weights": [kernel.tolist(), bias.tolist()],
            }
        )

    return {
        "use_imu": use_imu,
        "control_orientation": True,
        "observation_history": observation_history,
        "action_scale": action_scale,
        "kp": kp,
        "kd": kd,
        "default_joint_pos": np.asarray(default_pose).tolist(),
        "joint_upper_limits": np.asarray(joint_upper_limits).tolist(),
        "joint_lower_limits": np.asarray(joint_lower_limits).tolist(),
        "maximum_pitch_command": maximum_pitch_command,
        "maximum_roll_command": maximum_roll_command,
        "gait_phase_observation": bool(gait_phase_observation),
        "gait_frequency": float(gait_frequency),
        "control_dt": float(control_dt),
        "in_shape": [None, int(input_size)],
        "layers": layers,
    }


def apply_exported_policy(exported: Dict, observation) -> np.ndarray:
    """Replay an exported JSON policy on an observation (the on-robot C++
    controller's forward pass, reimplemented for round-trip testing)."""
    activations = {
        "relu": lambda x: np.maximum(x, 0.0),
        # minimum clips the expm1 argument so np.where's eagerly-evaluated
        # negative branch cannot overflow for large positive inputs
        "elu": lambda x: np.where(x > 0, x, np.expm1(np.minimum(x, 0.0))),
        "tanh": np.tanh,
        "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
        "swish": lambda x: x / (1.0 + np.exp(-x)),
        "silu": lambda x: x / (1.0 + np.exp(-x)),
        "linear": lambda x: x,
    }
    x = np.asarray(observation, np.float64)
    for layer in exported["layers"]:
        kernel, bias = layer["weights"]
        x = x @ np.asarray(kernel) + np.asarray(bias)
        x = activations[layer["activation"]](x)
    return x
