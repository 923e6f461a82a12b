"""Mesh construction and sharding helpers.

The reference has no multi-device parallelism at all (SURVEY.md §2.5); scale
came from fleets of independent single-GPU trainings. The TPU-native design
uses one strategy where it matters — batch-sharded data parallelism over ICI
— expressed as jax.sharding over a 1-D 'data' mesh. Gradients all-reduce via
the psum XLA inserts for replicated-out params; slide-level aggregation
reductions ride the same mesh.

MC-dropout inference can additionally shard the K-sample axis; see
biscuit_tpu.train.uq.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Optional[Sequence] = None,
                       axis: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place array leaves of a host batch onto the mesh, batch-dim sharded.

    Non-array leaves (e.g. the slide-name list) pass through on host.
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if isinstance(x, np.ndarray):
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()}
