"""Device mesh / distributed runtime setup.

Replaces the reference NCCL/SLURM bootstrap (dist_helper.py:13-46) with
jax.distributed + a 1-D ("data",) jax.sharding.Mesh over all devices.  All
collectives (grad pmean, SyncBN pmean, loss psum, memobank all_gather) are
compiled into the train step by XLA and ride ICI; there is no process-group
object, no barrier, and no pickle transport.

Multi-host: call `initialize_distributed()` before device enumeration —
it no-ops for single-process runs and uses jax.distributed auto-detection
(SLURM/OpenMPI env) otherwise.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("global")


def initialize_distributed() -> None:
    """Multi-host init (no-op single-process). Mirrors the reference
    setup_distributed (dist_helper.py:13-46), which auto-detects SLURM /
    torchrun env vars: we auto-detect a multi-process launch the same way
    (SLURM, OpenMPI, or an explicit JAX coordinator) and fall back to a
    single-process no-op. U2PL_TPU_MULTIHOST=1 still forces init."""
    if int(os.environ.get("U2PL_TPU_MULTIHOST", "0")):
        jax.distributed.initialize()
        return
    # explicit env bootstrap (the moral equivalent of torchrun's
    # RANK/WORLD_SIZE/MASTER_ADDR, reference dist_helper.py:35-37):
    coord = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or ""
    ).strip()
    nprocs = (os.environ.get("JAX_NUM_PROCESSES") or "").strip()
    proc_id = (os.environ.get("JAX_PROCESS_ID") or "").strip()
    if nprocs or proc_id:
        # explicit bootstrap: all three must be present and well-formed —
        # a partial/malformed set would otherwise fail cryptically (int(''))
        # or silently fall through to single-process mode.  (A coordinator
        # address alone is fine: SLURM/OpenMPI auto-detection below can fill
        # in the rest.)
        if not (coord and nprocs.isdigit() and proc_id.isdigit()):
            raise RuntimeError(
                "incomplete explicit jax.distributed bootstrap: need all of "
                "JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES (int), "
                "JAX_PROCESS_ID (int); got "
                f"coordinator={coord!r} num_processes={nprocs!r} "
                f"process_id={proc_id!r}"
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nprocs),
            process_id=int(proc_id),
        )
        return
    ntasks = int(os.environ.get("SLURM_NTASKS") or 1)
    ompi = int(os.environ.get("OMPI_COMM_WORLD_SIZE") or 1)
    if ntasks > 1 or ompi > 1 or coord:
        jax.distributed.initialize()


def all_sum_across_processes(x: np.ndarray) -> np.ndarray:
    """Sum a small host array across processes (reference all_reduce of the
    val intersection/union vectors, train_semi.py:639-641). Identity for
    single-process runs."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).sum(axis=0).astype(x.dtype)


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def world_size(mesh: Mesh) -> int:
    return mesh.devices.size


def process_is_primary() -> bool:
    return jax.process_index() == 0


def shard_host_batch(mesh: Mesh, x) -> jax.Array:
    """Per-process host batch slice -> batch-sharded global jax.Array.

    This is the multi-host feed the reference gets implicitly from DDP
    ("each rank's DataLoader feeds each rank's GPU", dist_helper.py:13-46 +
    DistributedSampler): each process hands its
    ``batch_size * local_device_count`` slice (what EpochLoader yields) and
    gets back ONE global array of shape ``(global_batch, ...)`` sharded
    P("data") over the whole mesh, which shard_map then splits per device.

    Single-process this is a plain device transfer — jit shards it — so the
    hot path is unchanged.  Multi-process, host-local arrays cannot cross
    into a jit over a global mesh (JAX cannot reshard data it cannot
    address), so the global array is assembled from the process-local
    shards without any cross-host data movement.
    """
    if jax.process_count() == 1:
        return jnp.asarray(x)
    return jax.make_array_from_process_local_data(
        data_sharding(mesh), np.ascontiguousarray(x)
    )


def replicate_to_mesh(mesh: Mesh, tree):
    """Host-identical pytree -> fully-replicated global arrays on the mesh.

    No-op single-process (jit replicates implicitly).  Multi-process, the
    train state built on each process (same seed / same checkpoint, so
    bitwise identical everywhere) is committed to *local* devices and
    cannot be passed into a jit spanning the global mesh; this re-commits
    every leaf as a P() (fully replicated) global array using each
    process's local copy as its shards.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def local_view(tree):
    """Per-process view of (possibly) globally-replicated arrays.

    Multi-process train states hold fully-replicated global jax.Arrays,
    which eager ops, jax.device_get, and single-device jits all reject
    (the array spans devices this process cannot address).  Every process
    holds a complete copy of a replicated array, so the local shard IS the
    value: return it as a plain local device array.  Leaves that are
    already process-local (the single-process case) pass through untouched.
    """

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x.addressable_data(0)
        return x

    return jax.tree_util.tree_map(get, tree)
