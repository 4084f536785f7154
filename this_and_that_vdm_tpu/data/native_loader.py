"""ctypes bindings for the native C++ frame loader (native/ttv_loader.cpp).

Falls back silently when the shared library hasn't been built
(``make -C native``); data/bridge.py uses it automatically when present.
Numerics are bit-identical to the Python cv2 path (same OpenCV underneath —
verified by tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libttv_loader.so",
)

_lib = None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ttv_load_frames.restype = ctypes.c_int
        lib.ttv_load_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ttv_load_frames_u8.restype = ctypes.c_int
        lib.ttv_load_frames_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def load_frames_native(
    paths: Sequence[str], hw, flip: bool = False, num_threads: int = 8
) -> np.ndarray:
    """Decode+resize+normalise to [-1,1] float32 ``[N, H, W, 3]`` (threaded C++)."""
    lib = get_lib()
    assert lib is not None, "native loader not built (make -C native)"
    h, w = hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.ttv_load_frames(
        arr, n, h, w, int(flip), num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:  # 1 + first failing index: decode failure must RAISE (the
        # cv2 path crashes on bad frames; silently training on zero-filled
        # mid-gray frames would corrupt runs without a trace)
        raise RuntimeError(f"native loader: cannot decode {paths[rc - 1]!r}")
    return out
