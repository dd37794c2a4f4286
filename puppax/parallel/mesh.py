"""Device mesh, shardings, and multi-host bootstrap (the distrib layer).

The reference had no distributed backend in-repo: brax PPO ``pmap``-ed over
local devices with implicit ``psum`` (SURVEY §2.4). The TPU-native design
replaces pmap with a global ``jax.sharding.Mesh`` over all chips and
``jit``-with-``NamedSharding`` semantics: the env batch is sharded over the
``'env'`` axis (data parallelism over ICI within a slice, DCN across
slices), parameters are replicated, and XLA inserts the gradient
all-reduce — no hand-written collectives on the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

ENV_AXIS = "env"


def maybe_initialize_distributed(**kwargs) -> None:
    """Bootstrap multi-host JAX (jax.distributed) if running under a
    multi-process launcher; a no-op in single-process runs.

    The coordinator address / process count come from the TPU runtime
    environment; callers on GKE/GCE pods call this once before any JAX op.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        import os

        if "COORDINATOR_ADDRESS" in os.environ:
            jax.distributed.initialize(**kwargs)
    except Exception:
        pass


def make_env_mesh(devices: Optional[list] = None) -> Mesh:
    """1-D mesh over all (or the given) devices with the 'env' data axis.

    The env/data batch dimension is the only sharded axis in this framework
    (SURVEY §2.3: the policy MLP is tiny — no TP/PP); scaling is pure data
    parallelism over ICI/DCN.
    """
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a pytree with a leading env-batch axis."""
    return NamedSharding(mesh, PartitionSpec(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated leaves (params, optimizer state, scalars)."""
    return NamedSharding(mesh, PartitionSpec())


def shard_env_batch(tree, mesh: Mesh):
    """Place a host pytree with leading batch axis onto the mesh, sharded
    over the env axis."""
    sharding = env_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim else x,
        tree,
    )
