"""ctypes wrapper for the native prefetching TUM loader."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libplslam_io.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.loader_size.restype = ctypes.c_int
    lib.loader_size.argtypes = [ctypes.c_void_p]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class TumLoader:
    """Iterates (gray, depth, timestamp) with native decode-ahead."""

    def __init__(self, assoc_path: str, root: str | None = None,
                 depth_factor: float = 5000.0, width: int = 640,
                 height: int = 480, n_threads: int = 4, prefetch: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++/libpng?)")
        root = root or os.path.dirname(os.path.abspath(assoc_path))
        self._lib = lib
        self._h = lib.loader_create(
            assoc_path.encode(), root.encode(), depth_factor, n_threads,
            prefetch,
        )
        if not self._h:
            raise FileNotFoundError(assoc_path)
        self.size = lib.loader_size(self._h)
        self._gray = np.empty(height * width, np.float32)
        self._depth = np.empty(height * width, np.float32)
        self._wh = (width, height)

    def __len__(self):
        return self.size

    def __iter__(self):
        ts = ctypes.c_double()
        w = ctypes.c_int()
        h = ctypes.c_int()
        while True:
            r = self._lib.loader_next(
                self._h,
                self._gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(ts), ctypes.byref(w), ctypes.byref(h),
            )
            if r == 0:
                return
            if r < 0:
                continue
            shape = (h.value, w.value)
            yield (
                self._gray[: shape[0] * shape[1]].reshape(shape).copy(),
                self._depth[: shape[0] * shape[1]].reshape(shape).copy(),
                ts.value,
            )

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
