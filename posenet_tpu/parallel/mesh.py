"""Device mesh helpers for SPMD data parallelism.

The reference is strictly single-device (SURVEY.md §2.3: `.cuda()` only, no
torch.distributed anywhere). The TPU-native scaling layer uses
`jax.sharding.Mesh` + NamedSharding: the batch is sharded over a 'data'
axis, params are replicated, and XLA inserts the gradient all-reduce over
ICI — no hand-written collectives at this model scale (BASELINE config 5:
DP fine-tune across 8 chips).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(num_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every leaf of a batch pytree with its leading axis sharded."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(pytree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), pytree)
