"""ctypes bindings for the native (C++) decode+resize core.

Builds `libstylegan_io.so` from data/native/stylegan_io.cc on first use
(g++ -O3, links libjpeg/libpng) and caches it next to the source.  If the
toolchain or libraries are unavailable the loader silently reports
``available() == False`` and the datasets fall back to PIL — behavior is
identical either way (the C++ resampler reimplements PIL's triangle filter;
see tests/test_native_io.py for the pixel-level check).

ctypes calls release the GIL, so the DataLoader's thread pool decodes
genuinely in parallel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native",
                    "stylegan_io.cc")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native",
                   "libstylegan_io.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-lpng",
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("STYLEGAN_TPU_NO_NATIVE_IO"):
            return None
        if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                       os.path.getmtime(_SRC)
                                       > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.sgio_decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            lib.sgio_decode_resize.restype = ctypes.c_int
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def decode_resize(data: bytes, out_res: int, flip: bool) -> np.ndarray:
    """Encoded JPEG/PNG bytes -> (res, res, 3) float32 in [-1, 1].

    Raises ValueError on decode failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        raise ValueError("native IO unavailable")
    out = np.empty((out_res, out_res, 3), np.float32)
    rc = lib.sgio_decode_resize(
        data, len(data), out_res, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native decode failed (code {rc})")
    return out
