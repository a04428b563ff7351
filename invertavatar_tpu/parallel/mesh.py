"""Device mesh + sharding helpers.

The reference implements exactly one parallelism strategy — hand-rolled data
parallelism over NCCL (flat-grad all_reduce, `training_loop.py:379-389`;
param broadcast :255-259; InfiniteSampler rank sharding). On TPU all of that
collapses into a single `Mesh(('data',))` with the batch sharded on `data` and
params replicated: XLA inserts the gradient psum, replicated init replaces the
broadcast, and ICI carries the collectives (SURVEY.md §2.3).

Multi-host: `jax.distributed.initialize()` + the same global mesh extends this
over DCN without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Shard leading (batch) axis of every leaf across the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def batch_spec(mesh: Mesh, axis_name: str = "data"):
    return NamedSharding(mesh, P(axis_name))


def replicated_spec(mesh: Mesh):
    return NamedSharding(mesh, P())
