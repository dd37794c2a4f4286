"""puppax.parallel — device mesh, shardings, multi-host bootstrap."""

from puppax.parallel.mesh import (  # noqa: F401
    ENV_AXIS,
    env_sharding,
    make_env_mesh,
    maybe_initialize_distributed,
    replicated_sharding,
    shard_env_batch,
)
