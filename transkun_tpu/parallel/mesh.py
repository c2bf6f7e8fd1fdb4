"""Device mesh and sharding helpers.

The reference scales by NCCL data parallelism only (``train.py:29-31``,
``TrainUtil.py:36-56``).  Here the equivalent is a JAX mesh with a ``dp``
axis over ICI: the batch is sharded over ``dp``, parameters and optimizer
state are replicated, and the gradient all-reduce is a ``psum`` inside the
jitted train step (inserted explicitly via shard_map).  Multi-host DCN comes
for free from ``jax.distributed`` when launched on a pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
