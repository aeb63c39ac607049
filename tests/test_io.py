"""IO tests: y4m roundtrip, cv2 mp4 roundtrip, synthetic source."""

import os
import numpy as np
from fractions import Fraction

from video_annotator_tpu.io.video import (
    VideoMeta,
    bgr_to_yuv420,
    open_reader,
    open_writer,
    yuv420_to_bgr,
)
from video_annotator_tpu.io.y4m import Y4MReader, Y4MWriter


def _planes(w, h, seed):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 256, (h, w), np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), np.uint8),
        rng.integers(0, 256, (h // 2, w // 2), np.uint8),
    )


def test_y4m_roundtrip(tmp_path):
    path = str(tmp_path / "t.y4m")
    wr = Y4MWriter(path, 64, 32, Fraction(24, 1))
    frames = [_planes(64, 32, i) for i in range(5)]
    for f in frames:
        wr.write(*f)
    wr.close()
    rd = Y4MReader(path)
    assert rd.header.width == 64 and rd.header.height == 32
    assert rd.header.fps == Fraction(24, 1)
    got = list(rd)
    assert len(got) == 5
    for (y, u, v), (y2, u2, v2) in zip(frames, got):
        np.testing.assert_array_equal(y, y2)
        np.testing.assert_array_equal(u, u2)
        np.testing.assert_array_equal(v, v2)


def test_reader_writer_roundtrip_y4m(tmp_path):
    path = str(tmp_path / "rw.y4m")
    meta = VideoMeta(48, 32, Fraction(30, 1))
    w = open_writer(path, meta)
    for i in range(3):
        w.write(_planes(48, 32, i))
    w.close()
    r = open_reader(path)
    assert r.meta.width == 48 and r.meta.num_frames == 3
    assert len(list(r)) == 3


def test_mp4_roundtrip(tmp_path):
    path = str(tmp_path / "t.mp4")
    meta = VideoMeta(64, 48, Fraction(30, 1))
    w = open_writer(path, meta)
    for i in range(4):
        y = np.full((48, 64), 100 + i * 20, np.uint8)
        u = np.full((24, 32), 128, np.uint8)
        v = np.full((24, 32), 128, np.uint8)
        w.write((y, u, v))
    w.close()
    r = open_reader(path)
    frames = list(r)
    assert len(frames) == 4
    # lossy codec: luminance preserved within a few levels
    assert abs(int(frames[0][0].mean()) - 100) < 10
    assert abs(int(frames[3][0].mean()) - 160) < 12


def test_yuv_bgr_roundtrip():
    y, _, _ = _planes(64, 32, 7)
    rng = np.random.default_rng(8)
    # keep chroma near neutral: saturated random UV leaves the RGB gamut
    # and clips, which would break the roundtrip for non-physical colors
    u = rng.integers(118, 138, (16, 32), np.uint8)
    v = rng.integers(118, 138, (16, 32), np.uint8)
    bgr = yuv420_to_bgr(y, u, v)
    y2, u2, v2 = bgr_to_yuv420(bgr)
    # 4:2:0 conversions are lossy; luma roundtrips closely.
    assert np.abs(y.astype(int) - y2.astype(int)).mean() < 3


def test_synthetic_source():
    r = open_reader("synthetic://shaky?w=128&h=96&n=6&seed=1")
    assert r.meta.width == 128 and r.meta.num_frames == 6
    frames = list(r)
    assert len(frames) == 6
    y0, u0, v0 = frames[0]
    assert y0.shape == (96, 128) and u0.shape == (48, 64)
    assert y0.std() > 20  # textured
    # consecutive frames differ (camera moves)
    assert np.abs(frames[1][0].astype(int) - y0.astype(int)).mean() > 0.5


# --- trim seeks (open_reader(start_frame=...)) ------------------------------


def test_y4m_seek(tmp_path):
    path = str(tmp_path / "seek.y4m")
    meta = VideoMeta(48, 32, Fraction(30, 1))
    w = open_writer(path, meta)
    frames = [_planes(48, 32, i) for i in range(9)]
    for f in frames:
        w.write(f)
    w.close()
    r = open_reader(path, start_frame=5)
    assert r.start_frame == 5
    got = list(r)
    assert len(got) == 4
    np.testing.assert_array_equal(got[0][0], frames[5][0])
    np.testing.assert_array_equal(got[-1][2], frames[8][2])
    r.close()


def _write_indexed_mp4(path, n=20, w=64, h=48):
    """Frames whose mean luma encodes the frame index (x264-robust)."""
    meta = VideoMeta(w, h, Fraction(30, 1))
    wr = open_writer(path, meta, encoder="mp4v")
    for i in range(n):
        y = np.full((h, w), 20 + i * 10, np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        wr.write((y, u, v))
    wr.close()
    return meta


def _assert_seeked(reader, start, n_total):
    frames = list(reader)
    assert len(frames) == n_total - start
    for off in (0, len(frames) - 1):
        want = 20 + (start + off) * 10
        assert abs(float(frames[off][0].mean()) - want) < 6, (
            off, float(frames[off][0].mean()), want)
    reader.close()


def test_native_seek_mp4(tmp_path):
    from video_annotator_tpu.io.native import native_available

    if not native_available():
        import pytest

        pytest.skip("native loader not built")
    path = str(tmp_path / "seek.mp4")
    _write_indexed_mp4(path, n=20)
    r = open_reader(path, prefer_native=True, start_frame=13)
    assert r.start_frame == 13
    _assert_seeked(r, 13, 20)


def test_cv2_seek_mp4(tmp_path):
    path = str(tmp_path / "seek_cv.mp4")
    _write_indexed_mp4(path, n=20)
    r = open_reader(path, prefer_native=False, start_frame=7)
    assert r.start_frame == 7
    _assert_seeked(r, 7, 20)


def test_seek_matches_skip(tmp_path):
    """Seeked iteration yields byte-identical frames to skip-from-zero."""
    path = str(tmp_path / "match.mp4")
    _write_indexed_mp4(path, n=16)
    full = list(open_reader(path, start_frame=0))
    seeked = open_reader(path, start_frame=10)
    got = list(seeked)
    if seeked.start_frame == 0:  # no seek support in this build
        got = got[10:]
    assert len(got) == 6
    for (y, u, v), (y2, u2, v2) in zip(full[10:], got):
        np.testing.assert_array_equal(y, y2)
        np.testing.assert_array_equal(u, u2)
        np.testing.assert_array_equal(v, v2)


def test_ffmpeg_delegated_encoder(tmp_path, monkeypatch):
    """Hardware/exotic encoder names (the reference's h264_vaapi/nvenc/amf
    targets, src/render.ts:275-281) delegate to an ffmpeg binary on PATH,
    streaming Y4M through its stdin."""
    import stat
    from fractions import Fraction

    from video_annotator_tpu.io.video import VideoMeta, open_writer

    fake = tmp_path / "bin" / "ffmpeg"
    fake.parent.mkdir()
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "args = sys.argv[1:]\n"
        "out = args[-1]\n"
        "data = sys.stdin.buffer.read()\n"
        "with open(out, 'wb') as f:\n"
        "    f.write((' '.join(args[:-1]) + '\\n').encode())\n"
        "    f.write(data)\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{fake.parent}:" + os.environ["PATH"])

    out = tmp_path / "out.mkv"
    meta = VideoMeta(64, 48, Fraction(30, 1))
    wr = open_writer(str(out), meta, encoder="h264_vaapi")
    y = np.full((48, 64), 17, np.uint8)
    c = np.full((24, 32), 128, np.uint8)
    for _ in range(3):
        wr.write((y, c, c))
    wr.close()

    blob = out.read_bytes()
    head, _, rest = blob.partition(b"\n")
    args = head.decode()
    # The reference's VAAPI encode shape: device init + hwupload + -qp 19.
    assert "-vaapi_device /dev/dri/renderD128" in args
    assert "format=nv12,hwupload" in args
    assert "-c:v h264_vaapi -qp 19" in args
    assert rest.startswith(b"YUV4MPEG2 W64 H48")
    assert rest.count(b"FRAME\n") == 3


def test_unknown_encoder_without_ffmpeg_errors(tmp_path, monkeypatch):
    """No silent mp4v substitution: an undeliverable encoder name fails
    loudly when no ffmpeg binary exists to delegate to."""
    from fractions import Fraction

    import pytest

    from video_annotator_tpu.io.video import VideoMeta, open_writer

    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(ValueError, match="h264_nvenc"):
        open_writer(str(tmp_path / "o.mkv"),
                    VideoMeta(64, 48, Fraction(30, 1)),
                    encoder="h264_nvenc")


def test_exotic_encoder_with_passthrough_delegates(tmp_path, monkeypatch):
    """An exotic encoder + stream passthrough must NOT silently encode
    libx264 via the native writer: it delegates to the ffmpeg binary
    (warning that passthrough is dropped)."""
    import stat
    from fractions import Fraction

    from video_annotator_tpu.io.video import VideoMeta, open_writer

    fake = tmp_path / "bin" / "ffmpeg"
    fake.parent.mkdir()
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "data = sys.stdin.buffer.read()\n"
        "open(sys.argv[-1], 'wb').write(data)\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{fake.parent}:" + os.environ["PATH"])

    out = tmp_path / "out.mkv"
    wr = open_writer(str(out), VideoMeta(64, 48, Fraction(30, 1)),
                     encoder="h264_vaapi",
                     copy_streams_from="/nonexistent/source.mp4")
    y = np.full((48, 64), 17, np.uint8)
    c = np.full((24, 32), 128, np.uint8)
    wr.write((y, c, c))
    wr.close()
    # The fake ffmpeg received Y4M — the native writer (which would have
    # silently substituted libx264) was not used.
    assert out.read_bytes().startswith(b"YUV4MPEG2")


def test_y4m_writer_accepts_pathlike(tmp_path):
    from fractions import Fraction
    from pathlib import Path

    w = Y4MWriter(Path(tmp_path / "p.y4m"), 32, 16, Fraction(30, 1))
    w.write(np.zeros((16, 32), np.uint8), np.zeros((8, 16), np.uint8),
            np.zeros((8, 16), np.uint8))
    w.close()
    assert (tmp_path / "p.y4m").read_bytes().startswith(b"YUV4MPEG2")
