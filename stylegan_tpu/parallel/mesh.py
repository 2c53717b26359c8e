"""Mesh construction for SPMD data-parallel training.

The framework scales the reference's single-device loop (SURVEY.md §2.11:
the reference has *no* multi-device path) by sharding the minibatch over a
1-D 'data' axis spanning all local (or all global, under jax.distributed)
devices: params and optimizer state replicated, gradients pmean'd over ICI
inside the compiled step (train/steps.py).  Multi-host: initialize
jax.distributed before calling create_mesh and pass per-host data shards via
the loader's (shard_index, num_shards).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), \
            f"requested {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def compatible_mesh_size(n_devices: int, batch_sizes) -> int:
    """Largest mesh size <= n_devices dividing every global batch size.

    The batch is sharded over the mesh axis, so each per-depth batch must
    split evenly; progressive schedules end in tiny batches (e.g. [...,4,2]),
    which would otherwise fail to trace days into a run."""
    n = max(1, int(n_devices))
    while n > 1 and any(bs % n != 0 for bs in batch_sizes):
        n -= 1
    return n


def resolve_max_devices(parallel_cfg=None, flag_value: Optional[int] = None) -> int:
    """Device budget for adaptive data parallelism.

    Precedence: explicit CLI flag > `parallel.data_axis` yaml knob ('auto' =
    all visible devices) > all visible devices.  Used by train.py; the
    trainer then sizes the actual mesh per depth (see
    trainer._mesh_for_batch)."""
    if flag_value:
        return int(flag_value)
    if parallel_cfg is not None:
        axis = parallel_cfg.get("data_axis", "auto")
        if axis != "auto":
            return int(axis)
    return jax.device_count()
