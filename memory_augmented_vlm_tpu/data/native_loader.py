"""ctypes bindings for the native threaded frame loader (runtime/).

The reference's media pipeline gets its throughput from native code (decord
decode threads + torch DataLoader workers, SURVEY.md §2.9); this is the
TPU-native analog for pre-extracted `.npy` frame tensors: a C++ worker pool
fills a bounded queue so host IO overlaps device compute.

Falls back to synchronous numpy loading when the shared library has not been
built (`make -C runtime`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
    "libframe_loader.so",
)
_lib: Optional[ctypes.CDLL] = None


def _load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class NativeFrameLoader:
    """Iterate (index, frames) over .npy files with background prefetch.

    Results may arrive out of order (worker races); `index` identifies the
    source path. Copies each buffer into an owned numpy array.
    """

    def __init__(self, paths: List[str], num_threads: int = 4, queue_cap: int = 8):
        self.paths = list(paths)
        self._lib = _load_library()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in self.paths])
            self._handle = self._lib.fl_create(arr, len(paths), num_threads, queue_cap)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        if self._handle is None:  # fallback: synchronous
            for i, p in enumerate(self.paths):
                yield i, np.load(p).astype(np.float32)
            return
        data_p = ctypes.POINTER(ctypes.c_float)()
        shape = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int()
        index = ctypes.c_int64()
        while True:
            status = self._lib.fl_next(
                self._handle, ctypes.byref(data_p), shape,
                ctypes.byref(ndim), ctypes.byref(index))
            if status == 1:
                break
            if status < 0:
                continue  # skip unreadable file (reference retry-ladder spirit)
            shp = tuple(shape[i] for i in range(ndim.value))
            count = int(np.prod(shp)) if shp else 0
            buf = np.ctypeslib.as_array(data_p, shape=(count,)).reshape(shp)
            yield int(index.value), buf.copy()

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def decode_y4m_native(path: str):
    """Decode a .y4m via the native C++ decoder (runtime/frame_loader.cpp
    fl_decode_y4m). Returns ((F, H, W, 3) uint8, fps) or None when the
    library (or symbol, for stale builds) is unavailable."""
    lib = _load_library()
    if lib is None or not hasattr(lib, "fl_decode_y4m"):
        return None
    lib.fl_decode_y4m.restype = ctypes.c_int
    lib.fl_decode_y4m.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.fl_free_u8.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
    data_p = ctypes.POINTER(ctypes.c_ubyte)()
    shape = (ctypes.c_int64 * 4)()
    fps = ctypes.c_double()
    rc = lib.fl_decode_y4m(path.encode(), ctypes.byref(data_p), shape,
                           ctypes.byref(fps))
    if rc != 0:
        raise ValueError(f"fl_decode_y4m({path}) failed with {rc}")
    shp = tuple(int(shape[i]) for i in range(4))
    count = int(np.prod(shp))
    frames = np.ctypeslib.as_array(data_p, shape=(count,)).reshape(shp).copy()
    lib.fl_free_u8(data_p)
    return frames, float(fps.value)
