"""Utilities: logging, source snapshot."""

from .logger import make_logger
from .snapshot import (copy_files_and_create_dirs,
                       list_dir_recursively_with_ignore, snapshot_sources)

__all__ = ["make_logger", "snapshot_sources",
           "copy_files_and_create_dirs", "list_dir_recursively_with_ignore"]
