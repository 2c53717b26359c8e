"""Device-mesh helpers for data-parallel training."""

from .distributed import (global_shard, host_count, host_index, is_multihost,
                          initialize_distributed, replicate)
from .mesh import (compatible_mesh_size, create_mesh, device_count,
                   resolve_max_devices)
from .spatial import (build_spatial_sample_fn, create_spatial_mesh,
                      spatial_hbm_estimate)

__all__ = ["create_mesh", "device_count", "compatible_mesh_size",
           "resolve_max_devices", "host_count", "host_index",
           "initialize_distributed", "is_multihost", "global_shard",
           "replicate", "build_spatial_sample_fn", "create_spatial_mesh",
           "spatial_hbm_estimate"]
