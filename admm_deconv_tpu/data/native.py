"""ctypes bindings for the native C++ image-loading runtime.

Wraps ``native/libimagefeeder.so`` (libpng decode + threaded aligned-crop
batch assembly — see ``native/imagefeeder.cpp``).  The library is built on
first use with the repo's ``native/Makefile``; if the toolchain or libpng is
unavailable the caller falls back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libimagefeeder.so")

_ERROR_NAMES = {
    1: "could not open file",
    2: "PNG decode failed",
    3: "crop larger than image",
    4: "not a PNG file",
}

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library():
    """Build (if needed) and dlopen the native library; None on failure."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.adtpu_image_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.adtpu_image_size.restype = ctypes.c_int
        lib.adtpu_load_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.adtpu_load_image.restype = ctypes.c_int
        lib.adtpu_load_pair_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.adtpu_load_pair_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """Whether the native loader can be used (builds lazily on first call)."""
    return _load_library() is not None


def image_size(path: str) -> tuple[int, int]:
    """(H, W) of a PNG without full Python-side decode."""
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native image loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    err = lib.adtpu_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if err != 0:
        raise IOError(f"{path}: {_ERROR_NAMES.get(err, err)}")
    return h.value, w.value


def load_pair_batch(
    x_paths: list[str],
    y_paths: list[str],
    crop_h: int,
    crop_w: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode + aligned-random-crop + batch n image pairs natively.

    Returns float32 NHWC ``(x, y)`` batches of shape ``(n, crop_h, crop_w, 3)``.
    """
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native image loader unavailable")
    n = len(x_paths)
    if n != len(y_paths):
        raise ValueError("x_paths and y_paths must have equal length")
    out_x = np.empty((n, crop_h, crop_w, 3), dtype=np.float32)
    out_y = np.empty((n, crop_h, crop_w, 3), dtype=np.float32)
    errs = (ctypes.c_int * n)()
    xp = (ctypes.c_char_p * n)(*[p.encode() for p in x_paths])
    yp = (ctypes.c_char_p * n)(*[p.encode() for p in y_paths])
    err = lib.adtpu_load_pair_batch(
        xp,
        yp,
        n,
        crop_h,
        crop_w,
        ctypes.c_uint64(seed & (2**64 - 1)),
        out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        errs,
    )
    if err != 0:
        bad = [
            f"{x_paths[i]}: {_ERROR_NAMES.get(errs[i], errs[i])}"
            for i in range(n)
            if errs[i] != 0
        ]
        raise IOError("; ".join(bad) or f"native loader error {err}")
    return out_x, out_y
