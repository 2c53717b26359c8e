"""Device-mesh helpers for data-parallel training."""

from .distributed import host_count, host_index, initialize_distributed
from .mesh import create_mesh, device_count

__all__ = ["create_mesh", "device_count",
           "host_count", "host_index", "initialize_distributed"]
