"""Parser robustness: hostile/truncated inputs must fail cleanly.

The GPMF KLV walker and the MP4 box parser consume camera-produced
bytes; corrupt SD cards and interrupted recordings are routine for the
reference's GoPro workflow, so malformed input must never hang, crash
with a non-Python error, or read out of bounds — only return empty
results or raise clean exceptions.
"""

import struct

import numpy as np
import pytest

from video_annotator_tpu.io.gpmf import (
    build_gpmf_payload,
    extract_imu,
    iter_klv,
    parse_sensor_packet,
)
from video_annotator_tpu.io.mp4 import parse_tracks

from test_gpmf import write_minimal_gpmf_mp4


def test_gpmf_random_bytes_never_crash():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 64, 1024):
        for _ in range(20):
            buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            list(iter_klv(buf))
            parse_sensor_packet(buf, 0.0, b"GYRO")


def test_gpmf_truncated_payload():
    payload = build_gpmf_payload(np.ones((10, 3)))
    for cut in range(0, len(payload), 7):
        pkts = parse_sensor_packet(payload[:cut], 0.0, b"GYRO")
        assert isinstance(pkts, list)


def test_gpmf_zero_size_klv_terminates():
    # size=0, repeat=0 entries advance by the 8-byte header: no livelock.
    buf = (b"JUNK" + bytes([0x42, 0, 0, 0])) * 50
    assert list(iter_klv(buf)) != [] or True
    parse_sensor_packet(buf, 0.0, b"GYRO")


def test_gpmf_lying_repeat_count():
    # repeat * size larger than the remaining buffer: entry is dropped.
    head = b"GYRO" + bytes([ord("s"), 6]) + struct.pack(">H", 60000)
    pkts = parse_sensor_packet(head + b"\x00" * 64, 0.0, b"GYRO")
    assert pkts == []


def test_mp4_truncated_file(tmp_path):
    path = str(tmp_path / "t.mp4")
    write_minimal_gpmf_mp4(path, [build_gpmf_payload(np.ones((8, 3)))] * 3)
    data = open(path, "rb").read()
    for cut in (0, 4, 12, len(data) // 3, len(data) - 5):
        p = str(tmp_path / f"cut{cut}.mp4")
        with open(p, "wb") as f:
            f.write(data[:cut])
        try:
            tracks = parse_tracks(p)
            assert isinstance(tracks, list)
        except Exception as e:
            assert isinstance(e, (ValueError, EOFError, struct.error, OSError))


def test_mp4_garbage_boxes(tmp_path):
    rng = np.random.default_rng(3)
    p = str(tmp_path / "junk.mp4")
    with open(p, "wb") as f:
        f.write(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
    try:
        parse_tracks(p)
    except Exception as e:
        assert isinstance(e, (ValueError, EOFError, struct.error, OSError))


def test_extract_imu_handles_missing_streams(tmp_path):
    path = str(tmp_path / "gyro_only.mp4")
    write_minimal_gpmf_mp4(path, [build_gpmf_payload(np.ones((8, 3)))])
    imu = extract_imu(path)
    assert imu[b"GYRO"] is not None
    assert imu[b"ACCL"] is None
    with pytest.raises(ValueError):
        from video_annotator_tpu.io.gpmf import extract_accl

        extract_accl(path)
