"""Spatially-sharded synthesis: split 1024^2 feature maps over the mesh.

The deep progressive stages are where both the FLOPs and the memory live,
but their schedule batches are tiny (FFHQ-1024 trains at batch 4/2 —
reference config.py:40-41), so data parallelism alone strands most of a pod
at exactly the most expensive resolutions.  The TPU-native answer
(SURVEY.md §5 "spatial sharding of 1024^2 feature maps across the mesh") is
to shard the *height* axis of every activation instead: XLA's GSPMD
partitioner handles spatially-partitioned convolutions natively, inserting
halo exchanges over ICI for the 3x3 convs and blurs, so the whole synthesis
network runs H-sharded from one output-sharding annotation — no manual
collectives, no per-op surgery (the scaling-book recipe: annotate, let XLA
insert the collectives).

This is the *serving* path: one image's 1024^2 forward spread over N chips
cuts per-chip HBM N-fold and lets a pod generate at batch sizes data
parallelism cannot reach.  Training keeps the shard_map data-parallel path
(train/steps.py) — at training batch sizes the data axis is the better use
of chips until the deep tail, and mixing the two is future work.

Exactness: spatial sharding is a pure layout choice — the sharded forward
equals the single-device forward to f32 roundoff
(tests/test_spatial.py::test_spatial_matches_single_device).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

SPATIAL_AXIS = "spatial"


def create_spatial_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the 'spatial' axis (height sharding)."""
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices)
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


def build_spatial_sample_fn(gen_cfg, mesh: Mesh, *, depth: int,
                            train_semantics: bool = False):
    """Compiled generator forward with every activation H-sharded over
    `mesh`'s 'spatial' axis.

    Returns fn(params, z, key) -> images (conditional models are not
    supported on this path), where images come back H-sharded (a
    NamedSharding over P(None, 'spatial')); np.asarray gathers them to
    host.  The output resolution 2^(depth+2) must divide by 4x the mesh
    size — a conservative bound keeping >=4 output rows per shard; GSPMD
    chooses internal shardings per stage itself (small early stages may be
    replicated or padded), so only the output layout needs to divide.

    GSPMD propagates the output sharding backward through the network:
    convs become spatially-partitioned convs with halo exchange, elementwise
    epilogues stay local, and the style matmuls/mapping replicate.  The
    packed layout is compatible (H' = H/2 still divides)."""
    from ..models import generator_apply

    res = 2 ** (depth + 2)
    n = mesh.shape[SPATIAL_AXIS]
    assert res % (n * 4) == 0, \
        (f"resolution {res} must divide over {n} spatial shards with at "
         f"least 4 rows each (the 4x4 base stage)")

    out_sharding = NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None))
    replicated = NamedSharding(mesh, P())

    def fn(params, z, key):
        out = generator_apply(gen_cfg, params, z, depth=depth, alpha=1.0,
                              rng=key, train=train_semantics)
        return jax.lax.with_sharding_constraint(out.images, out_sharding)

    return jax.jit(fn, in_shardings=(replicated, replicated, replicated),
                   out_shardings=out_sharding)


def spatial_hbm_estimate(res: int, channels: int, n_shards: int,
                         dtype_bytes: int = 2) -> float:
    """Per-chip bytes for one activation plane at `res` when H-sharded —
    the planning number for how many chips a serving deployment needs."""
    return res * res * channels * dtype_bytes / n_shards
