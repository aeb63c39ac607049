"""MP4 box parsing + GPMF gyro extraction tests."""

import struct

import numpy as np
import pytest

from video_annotator_tpu.io.gpmf import (
    build_gpmf_payload,
    extract_gyro,
    gyro_to_camera,
    parse_gyro_packet,
    DEFAULT_AXIS_MAP,
)
from video_annotator_tpu.io.mp4 import find_gpmf_track, parse_tracks


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def _full(typ: bytes, payload: bytes) -> bytes:
    return _box(typ, b"\x00\x00\x00\x00" + payload)


def write_minimal_gpmf_mp4(path, payloads, timescale=1000, delta=1001):
    """Tiny ISO-BMFF file with one 'meta'/GoPro MET track over ``payloads``."""
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(payloads)
    mdat = _box(b"mdat", mdat_payload)
    mdat_start = len(ftyp) + 8  # file offset of first sample

    n = len(payloads)
    offsets = []
    off = mdat_start
    for p in payloads:
        offsets.append(off)
        off += len(p)

    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = _full(b"stco", struct.pack(">I", n) + b"".join(
        struct.pack(">I", o) for o in offsets))
    stsc = _full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
    stts = _full(b"stts", struct.pack(">I", 1) + struct.pack(">II", n, delta))
    # One 'gpmd' sample entry (16-byte generic sample description), as in
    # real GoPro files — libav demuxers reject an empty stsd.
    gpmd = struct.pack(">I4s", 16, b"gpmd") + b"\x00" * 6 + struct.pack(">H", 1)
    stsd = _full(b"stsd", struct.pack(">I", 1) + gpmd)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    hdlr = _full(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"meta" + b"\x00" * 12 + b"\tGoPro MET\x00",
    )
    mdhd = _full(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta) + struct.pack(">HH", 0, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    # Valid movie header: timescale + duration (libav rejects timescale 0).
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    with open(path, "wb") as f:
        f.write(ftyp + mdat + moov)


def test_gpmf_payload_roundtrip():
    rng = np.random.default_rng(0)
    gyro = rng.uniform(-3, 3, (40, 3))
    payload = build_gpmf_payload(gyro)
    pkts = parse_gyro_packet(payload, 0.5)
    assert len(pkts) == 1
    assert pkts[0].samples.shape == (40, 3)
    np.testing.assert_allclose(pkts[0].samples, gyro, atol=1e-2)
    assert pkts[0].timestamp == 0.5


def test_axis_map_roundtrip():
    s = np.array([[1.0, 2.0, 3.0]])
    cam = gyro_to_camera(s, DEFAULT_AXIS_MAP)
    # default: x_cam = s[1], y_cam = -s[2], z_cam = -s[0]
    np.testing.assert_allclose(cam, [[2.0, -3.0, -1.0]])


def test_extract_gyro_from_minimal_mp4(tmp_path):
    path = str(tmp_path / "gyro.mp4")
    rng = np.random.default_rng(1)
    chunks = [rng.uniform(-2, 2, (20, 3)) for _ in range(5)]
    write_minimal_gpmf_mp4(path, [build_gpmf_payload(c) for c in chunks])

    track = find_gpmf_track(path)
    assert track is not None
    assert len(track.sample_sizes) == 5
    assert track.sample_times[1] == pytest.approx(1.001)

    omega, ts = extract_gyro(path)
    assert omega.shape == (100, 3)
    assert ts[0] == 0.0
    # last packet starts at 4*1.001; its tail samples assume ~400 Hz
    assert ts[-1] == pytest.approx(4 * 1.001 + 19 / 400.0, rel=1e-3)
    expect = gyro_to_camera(np.concatenate(chunks))
    np.testing.assert_allclose(omega, expect, atol=1e-2)


def test_parse_tracks_on_cv2_mp4(tmp_path):
    import cv2
    from video_annotator_tpu.io.video import VideoMeta, open_writer
    from fractions import Fraction

    path = str(tmp_path / "v.mp4")
    w = open_writer(path, VideoMeta(64, 48, Fraction(30, 1)))
    for i in range(10):
        w.write(
            (
                np.full((48, 64), i * 20, np.uint8),
                np.full((24, 32), 128, np.uint8),
                np.full((24, 32), 128, np.uint8),
            )
        )
    w.close()
    tracks = parse_tracks(path)
    video = [t for t in tracks if t.handler_type == b"vide"]
    assert video, [t.handler_type for t in tracks]
    t = video[0]
    assert len(t.sample_sizes) == 10
    assert len(t.sample_offsets) == 10
    assert t.sample_times[1] == pytest.approx(1 / 30, rel=1e-2)
    assert find_gpmf_track(path) is None


def test_gyro_pipeline_matches_vision(tmp_path):
    """Gyro-derived trajectory consistency: integrate a known trajectory's
    rates and recover the measured (C_t C_0^-1) rotations."""
    import jax.numpy as jnp

    from video_annotator_tpu import so3
    from video_annotator_tpu.smoothing.gyro import integrate_gyro

    # Camera spinning at constant body rate w: C_t = exp(-w t) C_0.
    w = np.array([0.1, -0.2, 0.15])
    ts = np.linspace(0, 2.0, 800).astype(np.float32)
    omega = np.tile(w, (800, 1)).astype(np.float32)
    frame_ts = np.linspace(0, 2.0, 61).astype(np.float32)
    R = integrate_gyro(jnp.asarray(omega), jnp.asarray(ts), jnp.asarray(frame_ts))
    measured = -np.asarray(so3.log(R))  # pipeline convention (render.py)
    expect = -np.outer(frame_ts, w)
    np.testing.assert_allclose(measured, expect, atol=5e-3)
