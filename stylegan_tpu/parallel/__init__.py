"""Device-mesh helpers for data-parallel training."""

from .mesh import create_mesh, device_count

__all__ = ["create_mesh", "device_count"]
