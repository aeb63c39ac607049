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
    if hasattr(lib, "va_open_seek"):  # pre-seek builds of the .so
        lib.va_open_seek.restype = ctypes.c_void_p
        lib.va_open_seek.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
        ]
        lib.va_start_frame.restype = ctypes.c_long
        lib.va_start_frame.argtypes = [ctypes.c_void_p]
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
    lib.va_error.restype = ctypes.c_char_p
    lib.va_error.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class NativeVideoSource:
    """Reader-compatible source backed by the C++ loader.

    ``start_frame`` trims at the demuxer: keyframe-backward seek plus a
    pts-exact decode-and-drop window in C (the ffmpeg ``-ss`` analogue the
    reference's trimmed renders rely on, ``src/render.ts:1369-1373``).
    Iteration then begins at source frame ``self.start_frame``.
    """

    def __init__(self, path: str, ring_frames: int = 8,
                 start_frame: int = 0):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self._lib = lib
        if start_frame > 0 and hasattr(lib, "va_open_seek"):
            self._h = lib.va_open_seek(path.encode(), ring_frames,
                                       int(start_frame))
            self.start_frame = int(start_frame)
        else:
            self._h = lib.va_open(path.encode(), ring_frames)
            self.start_frame = 0
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
        while self._h:  # a concurrent close() ends iteration, not a UAF
            y = np.empty((h, w), np.uint8)
            u = np.empty((h // 2, w // 2), np.uint8)
            v = np.empty((h // 2, w // 2), np.uint8)
            r = self._lib.va_next(
                self._h,
                y.ctypes.data_as(u8p),
                u.ctypes.data_as(u8p),
                v.ctypes.data_as(u8p),
            )
            if r < 0:
                # Decode errors must not pass as clean EOF: a truncated
                # file would otherwise silently render a short output.
                err = self._lib.va_error(self._h)
                raise RuntimeError(
                    f"native decode failed: {err.decode() if err else r}"
                )
            if r != 1:
                return
            yield y, u, v

    def close(self):
        if self._h:
            self._lib.va_close(self._h)
            self._h = None


_WRITER_LIB_PATH = os.path.join(os.path.dirname(_LIB_PATH), "libvawriter.so")
_wlib = None


def load_writer_library():
    global _wlib
    if _wlib is not None:
        return _wlib
    if not os.path.exists(_WRITER_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_WRITER_LIB_PATH)
    except OSError:
        return None
    lib.vaw_open.restype = ctypes.c_void_p
    lib.vaw_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
    ]
    lib.vaw_write.restype = ctypes.c_int
    lib.vaw_write.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint8)
    ] * 3
    lib.vaw_close.restype = ctypes.c_int
    lib.vaw_close.argtypes = [ctypes.c_void_p]
    lib.vaw_error.restype = ctypes.c_char_p
    lib.vaw_error.argtypes = [ctypes.c_void_p]
    _wlib = lib
    return lib


def native_writer_available() -> bool:
    return load_writer_library() is not None


class NativeVideoWriter:
    """Sink backed by the C++ encoder (libx264 QP 19 by default).

    The reference's encode semantics: ``-c:v libx264 -qp 19`` (visually
    lossless, ``src/render.ts:12-19``) with the source's audio and GPMF
    data tracks stream-copied alongside (``src/join.ts:56-82``). Pass
    ``copy_streams_from`` (and the trim window, source-time seconds) to
    enable the passthrough.
    """

    def __init__(self, path: str, meta: VideoMeta, encoder: str = "libx264",
                 qp: int = 19, copy_streams_from: Optional[str] = None,
                 trim_start: float = 0.0, trim_end: float = -1.0,
                 ring_frames: int = 8):
        lib = load_writer_library()
        if lib is None:
            raise RuntimeError("native writer not built (make -C native)")
        self._lib = lib
        self._w, self._h2 = meta.width, meta.height
        fps = Fraction(meta.fps)
        self._handle = lib.vaw_open(
            path.encode(), meta.width, meta.height,
            fps.numerator, fps.denominator, encoder.encode(), qp,
            copy_streams_from.encode() if copy_streams_from else None,
            float(trim_start), float(trim_end), ring_frames,
        )
        if not self._handle:
            raise RuntimeError(
                f"native writer cannot open {path} ({encoder})"
            )

    def write(self, planes):
        y, u, v = (np.ascontiguousarray(p, np.uint8) for p in planes)
        assert y.shape == (self._h2, self._w), (y.shape, self._w, self._h2)
        # The C side memcpys w*h/4 bytes from each chroma pointer —
        # undersized planes would read out of bounds.
        assert u.shape == (self._h2 // 2, self._w // 2), u.shape
        assert v.shape == (self._h2 // 2, self._w // 2), v.shape
        u8p = ctypes.POINTER(ctypes.c_uint8)
        r = self._lib.vaw_write(
            self._handle, y.ctypes.data_as(u8p), u.ctypes.data_as(u8p),
            v.ctypes.data_as(u8p),
        )
        if r != 1:
            err = self._lib.vaw_error(self._handle)
            raise RuntimeError(
                f"native encode failed: {err.decode() if err else r}"
            )

    def close(self):
        if self._handle:
            h, self._handle = self._handle, None
            status = self._lib.vaw_close(h)
            if status != 0:
                raise RuntimeError(f"native writer close failed ({status})")


_CONCAT_LIB_PATH = os.path.join(os.path.dirname(_LIB_PATH), "libvaconcat.so")
_clib = None


def load_concat_library():
    global _clib
    if _clib is not None:
        return _clib
    if not os.path.exists(_CONCAT_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_CONCAT_LIB_PATH)
    except OSError:
        return None
    lib.va_concat.restype = ctypes.c_int
    lib.va_concat.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_char_p,
    ]
    lib.va_concat_error.restype = ctypes.c_char_p
    lib.va_concat_error.argtypes = []
    _clib = lib
    return lib


def native_concat_available() -> bool:
    return load_concat_library() is not None


def native_concat(segments, output: str) -> None:
    """Lossless stream-copy concat of homogeneous segments (video +
    audio + GPMF data tracks) — the reference's `join`
    (``src/join.ts:59-82``), without an ffmpeg binary."""
    lib = load_concat_library()
    if lib is None:
        raise RuntimeError("native concat not built (make -C native)")
    arr = (ctypes.c_char_p * len(segments))(
        *[s.encode() for s in segments]
    )
    if lib.va_concat(arr, len(segments), output.encode()) != 0:
        err = lib.va_concat_error()
        raise RuntimeError(
            f"native concat failed: {err.decode() if err else 'unknown'}"
        )
