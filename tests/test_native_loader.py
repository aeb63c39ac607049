"""Native (C++/libav) loader vs the OpenCV reader."""

import numpy as np
import pytest
from fractions import Fraction

from video_annotator_tpu.io.native import NativeVideoSource, native_available
from video_annotator_tpu.io.video import VideoMeta, _CvSource, open_writer

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built (make -C native)"
)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "clip.mp4")
    w = open_writer(path, VideoMeta(128, 96, Fraction(30, 1)))
    rng = np.random.default_rng(0)
    for i in range(12):
        y = (rng.uniform(0, 255, (96, 128)) * 0.3 + i * 15).astype(np.uint8)
        u = np.full((48, 64), 120 + i, np.uint8)
        v = np.full((48, 64), 130 - i, np.uint8)
        w.write((y, u, v))
    w.close()
    return path


def test_native_meta(clip):
    src = NativeVideoSource(clip)
    assert src.meta.width == 128
    assert src.meta.height == 96
    assert float(src.meta.fps) == pytest.approx(30.0, rel=1e-3)
    src.close()


def test_native_matches_cv2(clip):
    native = list(NativeVideoSource(clip))
    cv = list(_CvSource(clip))
    assert len(native) == len(cv) == 12
    for (ny, nu, nv), (cy, cu, cv_) in zip(native, cv):
        assert ny.shape == cy.shape
        # same decode; only colorspace conversion differs (we: swscale
        # direct YUV; cv2: YUV->BGR->YUV roundtrip)
        assert np.abs(ny.astype(int) - cy.astype(int)).mean() < 4.0
        assert np.abs(nu.astype(int) - cu.astype(int)).mean() < 4.0


def test_native_double_iteration_eof(clip):
    src = NativeVideoSource(clip)
    assert len(list(src)) == 12
    assert len(list(src)) == 0  # exhausted
    src.close()


def test_native_missing_file():
    with pytest.raises(FileNotFoundError):
        NativeVideoSource("/nonexistent/file.mp4")


def test_native_selftest_binary():
    """Build + run the C++ IO self-test (threaded writer/loader/concat).
    `make -C native tsan` runs the same under ThreadSanitizer."""
    import subprocess, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(root, "native")
    r = subprocess.run(["make", "-C", native, "selftest"],
                       capture_output=True, text=True, timeout=120)
    if r.returncode != 0:
        pytest.skip(f"native selftest build unavailable: {r.stderr[-200:]}")
    r = subprocess.run([os.path.join(native, "selftest")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert "OK" in r.stdout


def test_native_odd_dimensions_even_cropped(tmp_path):
    """Odd display dimensions must decode even-cropped: chroma ring slots
    are sized w*h/4 and the consumer allocates (h//2, w//2) — an odd
    dimension previously overflowed both."""
    import cv2

    path = str(tmp_path / "odd.mp4")
    wr = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (127, 97)
    )
    assert wr.isOpened()
    rng = np.random.default_rng(1)
    for _ in range(6):
        wr.write(rng.integers(0, 255, (97, 127, 3), dtype=np.uint8))
    wr.release()

    src = NativeVideoSource(path)
    assert src.meta.width % 2 == 0 and src.meta.height % 2 == 0
    frames = list(src)
    src.close()
    assert len(frames) == 6
    y, u, v = frames[0]
    assert y.shape == (src.meta.height, src.meta.width)
    assert u.shape == (src.meta.height // 2, src.meta.width // 2)
    assert np.isfinite(y.astype(np.float64)).all()
