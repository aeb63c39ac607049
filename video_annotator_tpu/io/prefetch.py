"""Double-buffered host->device frame feed.

The reference's answer to decode/compute overlap is hardware surface
sharing (VAAPI frames mapped into OpenCL, ``opencv/hw_init.cpp:54-69``;
copied when mapping is unavailable, ``opencv/AvFrameSourceMapOpenCl.cpp``).
The TPU equivalent: a reader thread decodes ahead and issues asynchronous
``jax.device_put`` transfers a configurable depth in front of the consumer,
so PCIe/ICI transfer and TPU compute overlap with host decode.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a planar-YUV frame iterator with device-side prefetch.

    Yields ``(y, u, v)`` as device arrays of ``dtype``. ``depth`` frames are
    in flight at any time (decode + transfer happen on a worker thread; the
    transfers themselves are async dispatches).
    """

    def __init__(
        self,
        frames,
        depth: int = 3,
        dtype=jnp.float32,
        device: Optional[jax.Device] = None,
    ):
        self._frames = frames
        self._dtype = dtype
        self._device = device or jax.devices()[0]
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for y, u, v in self._frames:
                if self._stop.is_set():
                    return
                put = lambda a: jax.device_put(  # noqa: E731
                    np.asarray(a), self._device
                ).astype(self._dtype)
                self._q.put((put(y), put(u), put(v)))
            self._q.put(_SENTINEL)
        except BaseException as e:  # propagate into the consumer
            self._err = e
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array, jax.Array]]:
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self):
        self._stop.set()
        # drain so the worker can exit its put()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
