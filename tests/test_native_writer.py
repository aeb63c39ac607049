"""Native (C++/libav) writer: libx264 QP19 encode + stream passthrough.

The reference encodes with ``-c:v libx264 -qp 19`` ("visually lossless",
``src/render.ts:12-19``) and stream-copies the audio/GPMF tracks
(``src/join.ts:56-82``). These tests cover the native writer's encode
fidelity, last-frame/duration handling, the GPMF data-track passthrough
with trimming, and the ``open_writer`` routing.
"""

import numpy as np
import pytest
from fractions import Fraction

from video_annotator_tpu.io.native import (
    NativeVideoWriter,
    native_writer_available,
)
from video_annotator_tpu.io.video import (
    VideoMeta,
    _CvSink,
    open_reader,
    open_writer,
)

pytestmark = pytest.mark.skipif(
    not native_writer_available(),
    reason="native writer not built (make -C native)",
)


def _smooth_frames(w, h, n, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    out = []
    for i in range(n):
        y = np.clip(
            cv2.resize(base + i, (w, h), interpolation=cv2.INTER_CUBIC), 0, 255
        ).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        out.append((y, u, v))
    return out


def test_roundtrip_psnr_and_frame_count(tmp_path):
    """QP19 must round-trip smooth content near-losslessly, with EVERY
    frame present (the mov muxer gives the last sample duration 0 unless
    packet durations are set — decoders then drop it)."""
    path = str(tmp_path / "rt.mp4")
    w, h, n = 320, 240, 25
    frames = _smooth_frames(w, h, n)
    wr = open_writer(path, VideoMeta(w, h, Fraction(30, 1)), encoder="libx264")
    assert isinstance(wr, NativeVideoWriter)
    for f in frames:
        wr.write(f)
    wr.close()

    r = open_reader(path)
    back = list(iter(r))
    r.close()
    assert len(back) == n
    assert float(r.meta.fps) == pytest.approx(30.0, rel=1e-6)
    mse = np.mean(
        [
            (back[i][0].astype(np.float32) - frames[i][0]) ** 2
            for i in range(n)
        ]
    )
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 42.0, psnr


def test_gpmf_passthrough_and_trim(tmp_path):
    """Non-video source streams are copied into the output container,
    restricted to the trim window and re-based to t=0."""
    from tests.test_gpmf import write_minimal_gpmf_mp4
    from video_annotator_tpu.io.gpmf import build_gpmf_payload
    from video_annotator_tpu.io.mp4 import (
        find_gpmf_track,
        parse_tracks,
        read_track_samples,
    )

    src = str(tmp_path / "src.mp4")
    # 5 payloads at ~1.001 s spacing (timescale 1000 / delta 1001).
    payloads = [
        build_gpmf_payload([[0.1 * k, 0.2, 0.3]] * 8) for k in range(5)
    ]
    write_minimal_gpmf_mp4(src, payloads)

    out = str(tmp_path / "out.mp4")
    w, h = 128, 96
    wr = NativeVideoWriter(
        out, VideoMeta(w, h, Fraction(30, 1)), copy_streams_from=src,
        trim_start=1.0, trim_end=3.5,
    )
    for i in range(75):  # 2.5 s of video
        wr.write((
            np.full((h, w), (i * 3) % 255, np.uint8),
            np.full((h // 2, w // 2), 128, np.uint8),
            np.full((h // 2, w // 2), 128, np.uint8),
        ))
    wr.close()

    kinds = {t.handler_type for t in parse_tracks(out)}
    assert b"vide" in kinds and b"meta" in kinds
    track = find_gpmf_track(out)
    assert track is not None
    samples = list(read_track_samples(out, track))
    # Window [1.0, 3.5) of samples at 0, 1.001, 2.002, 3.003, 4.004 s
    # keeps indices 1..3.
    assert [bytes(s) for s, _ in samples] == payloads[1:4]
    # Timestamps re-based to the trim start.
    assert samples[0][1] == pytest.approx(0.001, abs=0.05)


def test_native_concat_lossless_with_gpmf(tmp_path):
    """GoPro chapter join: byte-preserving video packets and GPMF samples
    from every segment, timestamps advancing across the splice."""
    from tests.test_gpmf import write_minimal_gpmf_mp4
    from video_annotator_tpu.io.gopro import join
    from video_annotator_tpu.io.gpmf import build_gpmf_payload
    from video_annotator_tpu.io.mp4 import find_gpmf_track, read_track_samples
    from video_annotator_tpu.io.native import (
        native_concat_available,
    )

    if not native_concat_available():
        pytest.skip("native concat not built")

    w, h = 128, 96
    all_payloads = []
    for seg_i, name in enumerate(["GOPR7777.MP4", "GP017777.MP4"]):
        gp = str(tmp_path / f"gp{seg_i}.mp4")
        payloads = [
            build_gpmf_payload(np.full((4, 3), 0.1 * (seg_i * 2 + k)))
            for k in range(2)
        ]
        all_payloads += payloads
        write_minimal_gpmf_mp4(gp, payloads)
        wr = NativeVideoWriter(
            str(tmp_path / name), VideoMeta(w, h, Fraction(30, 1)),
            copy_streams_from=gp,
        )
        for i in range(60):  # 2 s per segment, covers both GPMF samples
            wr.write((
                np.full((h, w), (seg_i * 100 + i) % 255, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8),
            ))
        wr.close()

    out = str(tmp_path / "joined.mp4")
    join("7777", out, directory=str(tmp_path))

    r = open_reader(out)
    frames = list(iter(r))
    r.close()
    assert len(frames) == 120

    track = find_gpmf_track(out)
    assert track is not None
    samples = list(read_track_samples(out, track))
    assert [bytes(s) for s, _ in samples] == all_payloads
    times = [t for _, t in samples]
    assert times == sorted(times)
    # Second segment's samples land after the first segment's 2 s.
    assert times[2] >= 2.0 - 0.1


def test_open_writer_fourcc_falls_back_to_cv2(tmp_path):
    path = str(tmp_path / "cv.mp4")
    wr = open_writer(path, VideoMeta(64, 48, Fraction(30, 1)), encoder="mp4v")
    assert isinstance(wr, _CvSink)
    wr.close()


def test_default_encoder_prefers_native():
    from video_annotator_tpu.io.video import default_encoder

    assert default_encoder() == "libx264"
