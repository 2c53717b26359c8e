"""Standalone image transform (API parity with reference data/transforms.py).

get_transform(new_size) returns a callable mapping a PIL image or HWC array to
a normalized float32 NHWC-style HWC array in [-1, 1]: random horizontal flip
-> bilinear resize -> scale, identical to the reference's torchvision Compose
(RandomHorizontalFlip, Resize, ToTensor, Normalize(.5, .5)) except the output
layout is HWC (TPU-native) instead of CHW.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .datasets import _transform


def get_transform(new_size: Optional[Tuple[int, int]] = None):
    res = new_size[0] if new_size is not None else None

    def apply(img, rng: Optional[np.random.RandomState] = None):
        flip = bool(rng.randint(2)) if rng is not None else False
        if res is None:
            from PIL import Image
            if not isinstance(img, Image.Image):
                img = Image.fromarray(np.asarray(img))
            size = img.size[0]
            return _transform(img, size, flip)
        return _transform(img, res, flip)

    return apply
