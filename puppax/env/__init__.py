"""puppax.env — L3/L4: env runtime + the PupperV3 environment."""

from puppax.env.base import Env, State  # noqa: F401
from puppax.env.pupper import PupperV3Env  # noqa: F401
from puppax.env.wrappers import (  # noqa: F401
    AutoResetWrapper,
    EpisodeWrapper,
    VmapWrapper,
    wrap_for_training,
)
