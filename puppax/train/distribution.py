"""Tanh-squashed diagonal Gaussian action distribution.

The policy head emits 2x action_size logits = (loc, scale_param); actions
are tanh(loc + softplus(scale_param + init_bias)... ) — the same
NormalTanh parameterization the reference's brax PPO policy trained with,
whose (loc, scale) split is baked into the export ABI (the final layer's
second half is dropped at export, /root/reference/pupperv3_mjx/export.py:
39-41). Entropy is the single-sample estimate of the squashed
distribution's differential entropy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_STD = 0.001
_LOG2 = 0.6931471805599453


class NormalTanhDistribution:
    """Stateless helper over policy-head logits of size 2*event_size."""

    def __init__(self, event_size: int, min_std: float = _MIN_STD):
        self.event_size = event_size
        self.param_size = 2 * event_size
        self._min_std = min_std

    def _loc_scale(self, logits: jnp.ndarray):
        loc, scale = jnp.split(logits, 2, axis=-1)
        scale = jax.nn.softplus(scale) + self._min_std
        return loc, scale

    def sample_no_postprocessing(self, logits: jnp.ndarray, rng: jax.Array):
        """Pre-tanh sample (what rollouts store for exact log_prob replay)."""
        loc, scale = self._loc_scale(logits)
        return loc + scale * jax.random.normal(rng, loc.shape, loc.dtype)

    def postprocess(self, pre_tanh: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(pre_tanh)

    def sample(self, logits: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.postprocess(self.sample_no_postprocessing(logits, rng))

    def mode(self, logits: jnp.ndarray) -> jnp.ndarray:
        loc, _ = self._loc_scale(logits)
        return jnp.tanh(loc)

    def _forward_log_det_jacobian(self, pre_tanh: jnp.ndarray) -> jnp.ndarray:
        # log |d tanh(x)/dx| = 2 (log 2 - x - softplus(-2x)), numerically
        # stable for large |x|
        return 2.0 * (_LOG2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))

    def log_prob(self, logits: jnp.ndarray, pre_tanh: jnp.ndarray) -> jnp.ndarray:
        """Log density of the squashed action given its pre-tanh sample,
        summed over the event axis."""
        loc, scale = self._loc_scale(logits)
        normal_lp = (
            -0.5 * jnp.square((pre_tanh - loc) / scale)
            - jnp.log(scale)
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )
        lp = normal_lp - self._forward_log_det_jacobian(pre_tanh)
        return jnp.sum(lp, axis=-1)

    def entropy(self, logits: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Single-sample entropy estimate of the squashed distribution."""
        loc, scale = self._loc_scale(logits)
        normal_entropy = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
        pre_tanh = loc + scale * jax.random.normal(rng, loc.shape, loc.dtype)
        return jnp.sum(
            normal_entropy + self._forward_log_det_jacobian(pre_tanh), axis=-1
        )
