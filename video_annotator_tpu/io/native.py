"""ctypes bindings for the native (C++/libav) decode front-end.

``native/loader.cpp`` demuxes + decodes on a dedicated thread (plus
libavcodec's internal frame threading) into a planar-YUV ring buffer — the
reference's native decode chain (``opencv/AvFrameSourceFileVaapi.cpp`` ff.)
rebuilt for a host-CPU -> TPU pipeline. Falls back silently when the shared
library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from fractions import Fraction
from typing import Iterator, Optional, Tuple

import numpy as np

from video_annotator_tpu.io.video import VideoMeta

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libvaloader.so",
)

_lib = None


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.va_open.restype = ctypes.c_void_p
    lib.va_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.va_meta.restype = ctypes.c_int
    lib.va_meta.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 4 + [ctypes.POINTER(ctypes.c_long)]
    lib.va_next.restype = ctypes.c_int
    lib.va_next.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint8)
    ] * 3
    lib.va_close.restype = None
    lib.va_close.argtypes = [ctypes.c_void_p]
    lib.va_frame_index.restype = ctypes.c_long
    lib.va_frame_index.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeVideoSource:
    """Reader-compatible source backed by the C++ loader."""

    def __init__(self, path: str, ring_frames: int = 8):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self._lib = lib
        self._h = lib.va_open(path.encode(), ring_frames)
        if not self._h:
            raise FileNotFoundError(f"native loader cannot open {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fn = ctypes.c_int()
        fd = ctypes.c_int()
        n = ctypes.c_long()
        lib.va_meta(self._h, w, h, fn, fd, n)
        self.meta = VideoMeta(
            w.value, h.value,
            Fraction(fn.value or 30, fd.value or 1),
            n.value or None,
        )

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        w, h = self.meta.width, self.meta.height
        u8p = ctypes.POINTER(ctypes.c_uint8)
        while True:
            y = np.empty((h, w), np.uint8)
            u = np.empty((h // 2, w // 2), np.uint8)
            v = np.empty((h // 2, w // 2), np.uint8)
            r = self._lib.va_next(
                self._h,
                y.ctypes.data_as(u8p),
                u.ctypes.data_as(u8p),
                v.ctypes.data_as(u8p),
            )
            if r != 1:
                return
            yield y, u, v

    def close(self):
        if self._h:
            self._lib.va_close(self._h)
            self._h = None
