"""puppax.configs — configuration trees.

Reward scales mirror the reference defaults exactly
(/root/reference/pupperv3_mjx/config.py:19-64); the env/training configs
are frozen dataclasses with defaults mirroring the reference env kwargs
(/root/reference/pupperv3_mjx/environment.py:41-119).
"""

from puppax.configs.rewards import get_config  # noqa: F401
from puppax.configs.experiment import (  # noqa: F401
    DomainRandomizationConfig,
    EnvConfig,
    ExperimentConfig,
    TrainConfig,
    apply_overrides,
    config_hash,
    from_dict,
    to_dict,
)
