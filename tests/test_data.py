"""Data pipeline tests: dataset layouts, decode/transform semantics, loader
batching/sharding determinism."""

import os

import numpy as np
import pytest
from PIL import Image

from stylegan_tpu.data import (ClassFolderDataset, DataLoader,
                               FlatDirectoryImageDataset,
                               FoldersDistributedDataset, SyntheticDataset,
                               get_data_loader, make_dataset)


def _write_images(d, n, size=16, prefix="img"):
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{prefix}{i:03d}.png"))


class TestDatasets:
    def test_flat_directory(self, tmp_path):
        _write_images(str(tmp_path), 5)
        ds = FlatDirectoryImageDataset(str(tmp_path), resolution=8)
        assert len(ds) == 5
        img = ds[0]
        assert img.shape == (8, 8, 3)
        assert img.dtype == np.float32
        assert img.min() >= -1.0 and img.max() <= 1.0

    def test_folders_distributed(self, tmp_path):
        _write_images(str(tmp_path / "a"), 3)
        _write_images(str(tmp_path / "b"), 2)
        ds = FoldersDistributedDataset(str(tmp_path), resolution=8)
        assert len(ds) == 5

    def test_class_folders(self, tmp_path):
        _write_images(str(tmp_path / "cat"), 3)
        _write_images(str(tmp_path / "dog"), 2)
        ds = ClassFolderDataset(str(tmp_path), resolution=8)
        assert len(ds) == 5
        assert ds.classes == ["cat", "dog"]
        img, label = ds[0]
        assert label == 0
        img, label = ds[4]
        assert label == 1

    def test_npy_files(self, tmp_path):
        arr = np.random.RandomState(1).randint(
            0, 255, (3, 16, 16)).astype(np.float32)  # CHW like the reference
        np.save(str(tmp_path / "x.npy"), arr)
        ds = FlatDirectoryImageDataset(str(tmp_path), resolution=8)
        img = ds[0]
        assert img.shape == (8, 8, 3)

    def test_range_matches_reference_normalize(self, tmp_path):
        """ToTensor + Normalize(0.5, 0.5): uint8 v -> (v/255 - .5)/.5."""
        os.makedirs(tmp_path, exist_ok=True)
        arr = np.full((8, 8, 3), 200, dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / "c.png"))
        ds = FlatDirectoryImageDataset(str(tmp_path), resolution=8,
                                       random_flip=False)
        img = ds[0]
        np.testing.assert_allclose(img, (200 / 255 - 0.5) / 0.5, atol=1e-6)

    def test_make_dataset_factory(self, tmp_path):
        _write_images(str(tmp_path / "sub"), 2)
        class Cfg(dict):
            __getattr__ = dict.__getitem__
        cfg = Cfg(img_dir=str(tmp_path), folder=True, resolution=8)
        ds = make_dataset(cfg)
        assert isinstance(ds, FoldersDistributedDataset)
        cfg2 = Cfg(img_dir=str(tmp_path / "sub"), folder=False, resolution=8)
        assert isinstance(make_dataset(cfg2), FlatDirectoryImageDataset)


class TestLoader:
    def test_batching_drop_last(self):
        ds = SyntheticDataset(n=10, resolution=8)
        dl = DataLoader(ds, batch_size=4, num_workers=2, seed=1)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0].shape == (4, 8, 8, 3)

    def test_epoch_reshuffles(self):
        ds = SyntheticDataset(n=16, resolution=8)
        dl = DataLoader(ds, batch_size=8, num_workers=2, seed=2)
        e1 = np.concatenate(list(dl))
        e2 = np.concatenate(list(dl))
        assert not np.allclose(e1, e2)

    def test_conditional_batches(self):
        ds = SyntheticDataset(n=12, resolution=8, n_classes=3)
        dl = DataLoader(ds, batch_size=4, num_workers=2)
        x, y = next(iter(dl))
        assert x.shape == (4, 8, 8, 3)
        assert y.shape == (4,) and y.dtype == np.int32

    def test_sharding_disjoint(self):
        ds = SyntheticDataset(n=16, resolution=8)
        seen = []
        for shard in range(2):
            dl = DataLoader(ds, batch_size=4, num_workers=1, seed=3,
                            shuffle=False, shard_index=shard, num_shards=2)
            assert len(dl) == 2
            for b in dl:
                seen.append(b)
        total = np.concatenate(seen)
        assert total.shape[0] == 16
        # all 16 distinct samples covered exactly once
        flat = {total[i].tobytes() for i in range(16)}
        assert len(flat) == 16

    def test_factory(self):
        ds = SyntheticDataset(n=8, resolution=8)
        dl = get_data_loader(ds, 4, 2)
        assert len(dl) == 2


class TestLoaderRobustness:
    def test_abandon_iterator_no_deadlock(self):
        """Breaking out of iteration mid-epoch must not leave the producer
        thread blocked forever on a full queue."""
        import threading
        ds = SyntheticDataset(n=64, resolution=8)
        before = threading.active_count()
        for _ in range(5):
            it = iter(DataLoader(ds, batch_size=4, num_workers=2, prefetch=1))
            next(it)
            it.close()  # abandon mid-epoch
        import time
        time.sleep(0.5)  # give producers time to observe stop
        assert threading.active_count() <= before + 4

    def test_decode_error_surfaces(self, tmp_path):
        (tmp_path / "broken.png").write_bytes(b"not a png")
        ds = FlatDirectoryImageDataset(str(tmp_path), resolution=8)
        dl = DataLoader(ds, batch_size=1, num_workers=1, drop_last=False)
        import pytest as _pytest
        with _pytest.raises(Exception):
            list(dl)
