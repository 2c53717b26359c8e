"""Utilities: logging, source snapshot."""

from .logger import make_logger
from .snapshot import snapshot_sources

__all__ = ["make_logger", "snapshot_sources"]
