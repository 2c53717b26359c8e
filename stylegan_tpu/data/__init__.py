"""Data pipeline: datasets, transforms, threaded prefetching loader."""

from .datasets import (ClassFolderDataset, FlatDirectoryImageDataset,
                       FoldersDistributedDataset, SyntheticDataset,
                       make_dataset)
from .loader import DataLoader, get_data_loader

__all__ = [
    "ClassFolderDataset", "FlatDirectoryImageDataset",
    "FoldersDistributedDataset", "SyntheticDataset", "make_dataset",
    "DataLoader", "get_data_loader",
]
