"""Device mesh and sharding helpers + multi-host (pod) initialization.

The reference scales by NCCL data parallelism only (``train.py:29-31``,
``TrainUtil.py:36-56``), one spawned process per GPU on one node.  Here the
equivalent is a JAX mesh with a ``dp`` axis: the batch is sharded over
``dp``, parameters and optimizer state are replicated, and the gradient
all-reduce is a ``psum`` inside the jitted train step (inserted explicitly
via shard_map).  On one host the ``dp`` axis rides ICI; on a pod,
``init_distributed()`` must run BEFORE any other jax call so every process
joins one runtime and ``jax.devices()`` spans all hosts — the psum then
rides ICI within a slice and DCN across slices, with no code change in the
train step.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> bool:
    """Join the multi-process JAX runtime when launched on a pod, i.e. the
    counterpart of the reference's NCCL process-group setup
    (``train.py:29-31,400-403``) minus the per-GPU fork: one process per
    host, all chips of all hosts in one namespace.

    Initialization sources, in order:
      * TPU pod metadata (GCE/ GKE): ``jax.distributed.initialize()`` with no
        arguments auto-discovers coordinator/process ids.
      * Explicit env: ``JAX_COORDINATOR`` (host:port) +
        ``JAX_PROCESS_ID`` / ``JAX_NUM_PROCESSES``.

    Returns True if a multi-process runtime was initialized.  Must be called
    before the first jax backend use.  No-op (False) for single-host runs.
    """
    def _already_initialized(err: RuntimeError) -> bool:
        # Only the intended benign case is suppressed (a second cli
        # invocation in one process, e.g. train -> resume within a test).
        # A genuine failure — coordinator unreachable, bad env — must NOT
        # let a rank silently continue as a single-process run while the
        # job expected multi-host (ADVICE r4): re-raise everything else.
        return "already initialized" in str(err).lower() or (
            getattr(jax.distributed, "is_initialized", None) is not None
            and jax.distributed.is_initialized()
        )

    coord = os.environ.get("JAX_COORDINATOR")
    if coord:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        except RuntimeError as e:
            if not _already_initialized(e):
                raise
        return True
    # TPU pod runtime env (one process per host, auto-discovered).  A
    # single-entry worker list (e.g. TPU_WORKER_HOSTNAMES=localhost on a
    # lone chip) is NOT a pod — plain single-process execution.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([w for w in workers.split(",") if w.strip()]) > 1 or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            if not _already_initialized(e):
                raise
            # the runtime (or a local backend under a test harness) is
            # already up — report whether it is actually multi-process
            return jax.process_count() > 1
        return True
    return False


def process_info():
    """(process_index, process_count) — the loader-sharding rank/world pair
    (maps onto ``DatasetMaestroIterator``'s rank/world_size hooks like the
    reference's DistributedSampler, ``train.py:120-124``)."""
    return jax.process_index(), jax.process_count()


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """A dp mesh over ALL devices of the runtime — local chips single-host,
    every chip of every host after ``init_distributed()``."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
