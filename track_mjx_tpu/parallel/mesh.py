"""Device-mesh utilities for the pjit/global-array trainer.

TPU-native replacement for the reference's pmap machinery
(brax.training.pmap: device_put_replicated / assert_is_replicated /
synchronize_hosts — SURVEY.md 2b, 2c): one jitted SPMD program over a
Mesh(("batch",)) with env state sharded along the batch axis and parameters
replicated. Collectives (grad means, normalizer sums) are inserted by XLA and
ride ICI within a slice / DCN across slices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def create_mesh(
    devices: Optional[Sequence] = None, axis_name: str = BATCH_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.array(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = BATCH_AXIS) -> Any:
    """Places every leaf with its leading axis sharded over the mesh."""
    sharding = batch_sharded(mesh, axis_name)
    rep = replicated(mesh)

    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, sharding if x.ndim > 0 else rep)

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicates every leaf across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), rep), tree)


def assert_is_replicated(tree: Any, debug: Any = None) -> None:
    """Checks that replicated state is identical across devices (parity with
    brax.training.pmap.assert_is_replicated, reference mlp_ppo/ppo.py:805).

    With global arrays, replication is a sharding invariant; we additionally
    verify value equality across device shards for defense in depth."""

    def check(x):
        x = jax.numpy.asarray(x)
        shards = getattr(x, "addressable_shards", None)
        if not shards or len(shards) < 2:
            return
        first = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(first, np.asarray(s.data), equal_nan=True):
                raise AssertionError(f"state is not replicated: {debug}")

    jax.tree.map(check, tree)


def synchronize_hosts() -> None:
    """Barrier across processes (parity with pmap.synchronize_hosts)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("track_mjx_tpu_sync")


def unreplicate(tree: Any) -> Any:
    """Pulls a host-local copy of (replicated) global arrays — the global-array
    analogue of the reference's `_unpmap` (mlp_ppo/ppo.py:69-70)."""
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)
