"""DevicePrefetcher / AsyncFrameWriter threading contracts.

Regression: ``DevicePrefetcher.close()`` must JOIN its worker before
returning — the pipeline closes the underlying source right after, and a
still-running worker would call into a freed native-loader handle
(observed as a segfault in ``va_next`` on trimmed renders, where the
frame loop breaks before EOF).
"""

import threading
import time

import numpy as np

from video_annotator_tpu.io.prefetch import DevicePrefetcher


class _Source:
    """Iterator that records every next() call and can simulate slowness."""

    def __init__(self, n=100, delay=0.0):
        self.n = n
        self.delay = delay
        self.calls = 0
        self.closed = False

    def __iter__(self):
        for i in range(self.n):
            assert not self.closed, "next() after close(): use-after-free"
            self.calls += 1
            if self.delay:
                time.sleep(self.delay)
            p = np.full((8, 8), i % 255, np.uint8)
            yield p, p[:4, :4], p[:4, :4]


def test_close_joins_worker_and_stops_source():
    src = _Source(n=1000)
    pre = DevicePrefetcher(iter(src), depth=2)
    it = iter(pre)
    for _ in range(3):
        next(it)
    pre.close()
    # close() returned: the worker must be gone...
    assert not pre._thread.is_alive()
    # ...and marking the source closed afterwards must never trip the
    # worker's assertion (no further next() calls can happen).
    src.closed = True
    time.sleep(0.05)
    assert not pre._thread.is_alive()


def test_close_unblocks_worker_stuck_in_put():
    # depth 1 and no consumption: the worker blocks in q.put().
    src = _Source(n=1000, delay=0.001)
    pre = DevicePrefetcher(iter(src), depth=1)
    time.sleep(0.05)  # let it fill and block
    t0 = time.perf_counter()
    pre.close()
    assert time.perf_counter() - t0 < 5.0
    assert not pre._thread.is_alive()
    src.closed = True


def test_exhausted_iteration_still_closes():
    src = _Source(n=4)
    pre = DevicePrefetcher(iter(src), depth=2)
    frames = list(pre)
    assert len(frames) == 4
    pre.close()
    assert not pre._thread.is_alive()


def test_error_propagates_to_consumer():
    def bad():
        yield (np.zeros((8, 8), np.uint8),) * 3
        raise RuntimeError("decode exploded")

    pre = DevicePrefetcher(bad(), depth=2)
    it = iter(pre)
    next(it)
    try:
        next(it)
    except RuntimeError as e:
        assert "decode exploded" in str(e)
    else:
        raise AssertionError("worker error did not propagate")
    pre.close()
    assert not pre._thread.is_alive()
