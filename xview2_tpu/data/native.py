"""ctypes bridge to the native (C++) threaded image decoder.

Loads ``native/libxv2native.so`` (built by ``native/build.sh``) and exposes a
batch decode that releases the GIL while a pthread pool decodes PNG/JPEG files
straight into one preallocated numpy block — the TPU-native stand-in for the
reference's OpenCV-in-worker-processes input path.  Falls back to PIL when the
library hasn't been built (``is_available()``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libxv2native.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.xv2_decode_image.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.xv2_decode_image.restype = ctypes.c_int
    lib.xv2_decode_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.POINTER(ctypes.c_uint8),
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.xv2_decode_batch.restype = ctypes.c_int
    lib.xv2_probe_png.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.xv2_probe_png.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def probe_png(path: str):
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (run native/build.sh)")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.xv2_probe_png(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"probe failed ({rc}) for {path}")
    return h.value, w.value


def decode_batch(paths: Sequence[str], h: int, w: int, c: int,
                 n_threads: int = 8) -> np.ndarray:
    """Decode ``paths`` concurrently into a (N, h, w, c) uint8 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (run native/build.sh)")
    n = len(paths)
    out = np.empty((n, h, w, c), np.uint8)
    results = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.xv2_decode_batch(
        arr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, n_threads, results)
    if rc != 0:
        bad = [paths[i] for i in range(n) if results[i] != 0]
        raise IOError(f"native decode failed ({rc}) for {bad[:3]}")
    return out
