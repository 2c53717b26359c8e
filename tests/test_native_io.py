"""Native (C++) decode+resize core: pixel parity with the PIL path and
integration through the datasets."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from stylegan_tpu.data import native
from stylegan_tpu.data.datasets import (FlatDirectoryImageDataset, _decode,
                                        _transform)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native IO toolchain unavailable")


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpg_bytes(arr, quality=95):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("src,dst", [(16, 16), (64, 16), (48, 32), (16, 32)])
def test_png_matches_pil(src, dst):
    arr = np.random.RandomState(src + dst).randint(
        0, 255, (src, src, 3), dtype=np.uint8)
    data = _png_bytes(arr)
    ours = native.decode_resize(data, dst, False)
    pil = _transform(Image.open(io.BytesIO(data)).convert("RGB"), dst, False)
    # PIL uses fixed-point filter coefficients; allow +-2/255 in [-1,1] scale
    np.testing.assert_allclose(ours, pil, atol=2.5 / 255 * 2)


def test_flip_matches_pil():
    arr = np.random.RandomState(7).randint(0, 255, (32, 32, 3), np.uint8)
    data = _png_bytes(arr)
    ours = native.decode_resize(data, 16, True)
    pil = _transform(Image.open(io.BytesIO(data)).convert("RGB"), 16, True)
    np.testing.assert_allclose(ours, pil, atol=2.5 / 255 * 2)


def test_jpeg_decodes():
    arr = np.random.RandomState(9).randint(0, 255, (64, 64, 3), np.uint8)
    data = _jpg_bytes(arr)
    ours = native.decode_resize(data, 32, False)
    pil = _transform(Image.open(io.BytesIO(data)).convert("RGB"), 32, False)
    # same libjpeg underneath; only resample coefficient rounding differs
    np.testing.assert_allclose(ours, pil, atol=3 / 255 * 2)


def test_invalid_data_raises():
    with pytest.raises(ValueError):
        native.decode_resize(b"not an image at all", 16, False)


def test_dataset_uses_native(tmp_path, monkeypatch):
    arr = np.random.RandomState(1).randint(0, 255, (24, 24, 3), np.uint8)
    Image.fromarray(arr).save(tmp_path / "a.png")
    ds = FlatDirectoryImageDataset(str(tmp_path), resolution=16,
                                   random_flip=False)
    img_native = ds[0]
    # force the PIL fallback and compare
    monkeypatch.setenv("STYLEGAN_TPU_NO_NATIVE_IO", "1")
    img_pil = _transform(_decode(ds.files[0]), 16, False)
    np.testing.assert_allclose(img_native, img_pil, atol=2.5 / 255 * 2)
