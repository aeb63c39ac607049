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
