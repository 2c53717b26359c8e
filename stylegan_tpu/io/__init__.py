"""IO: checkpoints and image grids."""

from . import checkpoint
from .image import adjust_dynamic_range, save_image_grid, save_single_image

__all__ = ["checkpoint", "adjust_dynamic_range", "save_image_grid",
           "save_single_image"]
