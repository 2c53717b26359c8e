"""Multi-host (multi-process) initialization.

Single-slice multi-chip needs nothing beyond the mesh (all devices are local).
For multi-host pods / multi-slice DCN deployments, call
``initialize_distributed()`` once at process start; afterwards
``create_mesh()`` sees the global device set and the data loader should be
sharded per host:

    initialize_distributed()                     # reads TPU env / args
    mesh = create_mesh()                         # global 1-D 'data' mesh
    loader = DataLoader(..., shard_index=host_index(), num_shards=host_count())

Collectives then ride ICI within a slice and DCN across slices — XLA picks
the transport from the mesh's device order; no NCCL-style backend exists or
is needed (the reference's NCCL references live only in dead vendored code,
SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU-env autodetection by default."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_index() -> int:
    return jax.process_index()


def host_count() -> int:
    return jax.process_count()


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_shard(mesh, local, axis_name: str = "data", spec=None):
    """Assemble each host's local batch shard into one global batch-sharded
    array over `mesh`'s `axis_name` (or an explicit PartitionSpec `spec`,
    e.g. P('data', 'spatial') for the 2-D GSPMD train step — any extra
    sharded axes must then be fully covered by this host's local data).

    `local` is this process's slice of the global batch (the loader's
    per-host stripe); the returned jax.Array has global shape
    (local_batch * host_count, ...) laid out so each device holds its own
    contiguous piece — no cross-host data movement happens here, only
    metadata assembly.  Under a single process this is a plain device_put.
    """
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name) if spec is None else spec)
    local = np.asarray(local)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def replicate(mesh, tree):
    """Replicate a host-local pytree over every device of `mesh` (params /
    optimizer state / EMA under data parallelism).  Works across processes:
    every host must hold identical values (deterministic same-seed init or a
    restored checkpoint)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    return jax.device_put(tree, NamedSharding(mesh, P()))
