"""Multi-host (DCN) initialization + global-mesh helpers.

The reference is single-host only (file:// rendezvous in a local temp dir,
train_avatar_texture.py:62-68; SURVEY §4 "multi-node is not addressed").
Here multi-host comes from `jax.distributed.initialize` + one global mesh:
params replicate over all devices, the batch shards over the global `data`
axis, gradient reductions ride ICI within a slice and DCN across slices —
no user-visible collectives.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX when running under a launcher.

    With no arguments, resolves from the standard env vars (TPU pod metadata
    or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-ops
    on single-process runs.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis_name: str = "data") -> Mesh:
    """One global data-parallel mesh over every device on every host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_slice(global_batch: int) -> slice:
    """This host's shard of a globally-indexed batch (InfiniteSampler-style
    rank sharding is preferred; this helper serves array-sharded pipelines)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def check_replica_consistency_local(params, atol: float = 0.0) -> None:
    """Single-process variant: assert every device's shard of each replicated
    array is identical (the devices of one host stand in for ranks). Arrays
    that are not fully replicated are skipped — only parameters/EMA state are
    expected to be replicated (reference check_ddp_consistency scope)."""
    leaves = jax.tree_util.tree_leaves(params)
    for i, leaf in enumerate(leaves):
        if not hasattr(leaf, "sharding") or not leaf.is_fully_replicated:
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            diff = np.abs(np.asarray(s.data) - ref)
            if diff.size and diff.max() > atol:
                raise AssertionError(
                    f"device {s.device} differs from {shards[0].device} at leaf {i} "
                    f"(max abs diff {diff.max()})"
                )


def check_replica_consistency(params, atol: float = 0.0) -> None:
    """Reference torch_utils/misc.py:202 `check_ddp_consistency`: assert the
    replicated param pytree is bit-identical across processes. No-op single
    process; raises with the first mismatching path otherwise."""
    import jax
    import numpy as np

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree_util.tree_flatten(params)
    sums = np.asarray([np.float64(np.sum(np.asarray(l, np.float64))) for l in leaves],
                      np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(sums.astype(np.float32)))
    ref = gathered[0]
    for p in range(1, gathered.shape[0]):
        bad = np.where(np.abs(gathered[p] - ref) > atol)[0]
        if bad.size:
            paths = jax.tree_util.tree_structure(params)
            raise AssertionError(
                f"replica {p} differs from replica 0 at leaf {int(bad[0])} "
                f"(checksum {gathered[p][bad[0]]} vs {ref[bad[0]]})"
            )
