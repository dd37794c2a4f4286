"""puppax.train — L5: PPO learner, networks, normalization, checkpoints."""

from puppax.train.networks import (  # noqa: F401
    PPONetworkParams,
    PPONetworks,
    make_inference_fn,
    make_ppo_networks,
)
from puppax.train.ppo import train  # noqa: F401
