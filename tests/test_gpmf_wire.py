"""GPMF parser vs hand-written KLV wire bytes (non-circular fixtures).

`tests/test_gpmf.py` builds its fixtures with the repo's own serializer
(`build_gpmf_payload`), so a parser bug mirrored in the writer is
invisible there. These fixtures are raw byte strings assembled inline —
sharing no code with the serializer — and cover the structural variants
real GoPro H4B files carry that the self-muxed fixtures never exercise
(`/root/reference/opencv/gpmf.cpp:82-105` walks these): per-channel
SCAL arrays, TSMP/STMP counters, multiple DEVC devices, complex/unknown
types interleaved with GYRO, plus corrupt inputs (truncation mid-KLV,
repeat overflow, pathological nesting) asserting clean rejection.
"""

import struct

import numpy as np
import pytest

from video_annotator_tpu.io.gpmf import (
    iter_klv,
    parse_gyro_packet,
    parse_sensor_packet,
)


def K(key: bytes, typ, size: int, repeat: int, payload: bytes) -> bytes:
    """One KLV, assembled by hand (4cc, type, size, >H repeat, padded).

    Deliberately NOT gpmf.build_gpmf_payload — the point is that these
    bytes are produced by an independent reading of the wire format.
    """
    assert len(key) == 4
    t = typ if isinstance(typ, int) else ord(typ)
    body = key + bytes([t, size]) + repeat.to_bytes(2, "big") + payload
    while len(body) % 4:
        body += b"\x00"
    return body


def i16be(*vals) -> bytes:
    return b"".join(int(v).to_bytes(2, "big", signed=True) for v in vals)


GYRO_RAW = [(100, -200, 300), (-400, 500, -600)]  # 2 samples, (z, x, y)


def gyro_klv() -> bytes:
    return K(b"GYRO", "s", 6, 2, b"".join(i16be(*s) for s in GYRO_RAW))


def strm(*klvs: bytes) -> bytes:
    body = b"".join(klvs)
    return K(b"STRM", 0, 1, len(body), body)


def devc(*klvs: bytes) -> bytes:
    body = b"".join(klvs)
    return K(b"DEVC", 0, 1, len(body), body)


def test_real_layout_with_metadata_klvs():
    """The full H4B stream layout: DVID/DVNM, TSMP/STMP/STNM/SIUN ahead
    of SCAL+GYRO — metadata keys must be skipped, not break scaling."""
    payload = devc(
        K(b"DVID", "L", 4, 1, (1001).to_bytes(4, "big")),
        K(b"DVNM", "c", 1, 6, b"Camera"),
        strm(
            K(b"TSMP", "L", 4, 1, (2).to_bytes(4, "big")),
            K(b"STMP", "J", 8, 1, (123456789).to_bytes(8, "big")),
            K(b"STNM", "c", 1, 17, b"Gyroscope (z,x,y)"),
            K(b"SIUN", "c", 5, 1, b"rad/s"),
            K(b"SCAL", "s", 2, 1, i16be(939)),
            gyro_klv(),
        ),
    )
    pkts = parse_gyro_packet(payload, 0.0)
    assert len(pkts) == 1
    np.testing.assert_allclose(
        pkts[0].samples, np.asarray(GYRO_RAW, np.float64) / 939.0)


def test_per_channel_scal_array():
    """SCAL with repeat=3 (one divisor per channel) divides per column."""
    payload = devc(strm(
        K(b"SCAL", "s", 2, 3, i16be(10, 20, 40)),
        gyro_klv(),
    ))
    pkts = parse_gyro_packet(payload, 0.0)
    assert len(pkts) == 1
    expect = np.asarray(GYRO_RAW, np.float64) / np.asarray([10.0, 20.0, 40.0])
    np.testing.assert_allclose(pkts[0].samples, expect)


def test_scal_type_int32():
    """Later firmware writes SCAL as type 'l' (int32)."""
    payload = devc(strm(
        K(b"SCAL", "l", 4, 1, (3755).to_bytes(4, "big")),
        gyro_klv(),
    ))
    pkts = parse_gyro_packet(payload, 0.0)
    np.testing.assert_allclose(
        pkts[0].samples, np.asarray(GYRO_RAW, np.float64) / 3755.0)


def test_multiple_devc_devices():
    """Two DEVC containers (camera + paired sensor) each contribute."""
    payload = (
        devc(strm(K(b"SCAL", "s", 2, 1, i16be(1)), gyro_klv()))
        + devc(strm(K(b"SCAL", "s", 2, 1, i16be(2)), gyro_klv()))
    )
    pkts = parse_gyro_packet(payload, 0.0)
    assert len(pkts) == 2
    np.testing.assert_allclose(pkts[0].samples * 0.5, pkts[1].samples)


def test_unknown_and_complex_types_interleaved():
    """TYPE-defined complex records ('?'), fourcc ('F') and string keys
    between SCAL and GYRO are skipped without derailing the walk."""
    payload = devc(strm(
        K(b"TYPE", "c", 1, 3, b"LLf"),
        K(b"SCAL", "s", 2, 1, i16be(100)),
        K(b"FACE", "?", 12, 2, bytes(24)),
        K(b"FCNM", "F", 4, 1, b"GoPr"),
        K(b"EMPT", "B", 1, 0, b""),
        gyro_klv(),
    ))
    pkts = parse_gyro_packet(payload, 0.0)
    assert len(pkts) == 1
    np.testing.assert_allclose(
        pkts[0].samples, np.asarray(GYRO_RAW, np.float64) / 100.0)


def test_scal_scoped_per_stream():
    """Sibling ACCL and GYRO streams each use their own STRM's SCAL."""
    payload = devc(
        strm(K(b"SCAL", "s", 2, 1, i16be(939)), gyro_klv()),
        strm(K(b"SCAL", "s", 2, 1, i16be(418)),
             K(b"ACCL", "s", 6, 2, b"".join(i16be(*s) for s in GYRO_RAW))),
    )
    gy = parse_sensor_packet(payload, 0.0, b"GYRO")
    ac = parse_sensor_packet(payload, 0.0, b"ACCL")
    assert len(gy) == 1 and len(ac) == 1
    np.testing.assert_allclose(
        gy[0].samples, np.asarray(GYRO_RAW, np.float64) / 939.0)
    np.testing.assert_allclose(
        ac[0].samples, np.asarray(GYRO_RAW, np.float64) / 418.0)


def test_gyro_with_wrong_channel_count_skipped():
    payload = devc(strm(
        K(b"SCAL", "s", 2, 1, i16be(1)),
        K(b"GYRO", "s", 4, 2, i16be(1, 2, 3, 4)),  # 2-channel: not a gyro
    ))
    assert parse_gyro_packet(payload, 0.0) == []


# --- corrupt inputs: the shapes real truncated/damaged files produce ----


def test_truncated_mid_header():
    good = devc(strm(K(b"SCAL", "s", 2, 1, i16be(939)), gyro_klv()))
    # Append 5 stray bytes (a header needs 8): iterator must stop clean.
    pkts = parse_gyro_packet(good + b"DEVC\x00", 0.0)
    assert len(pkts) == 1


def test_truncated_mid_payload():
    payload = devc(strm(K(b"SCAL", "s", 2, 1, i16be(939)), gyro_klv()))
    for cut in range(1, len(payload)):
        # Every prefix must parse without raising; the outermost DEVC's
        # declared extent now exceeds the buffer, so a clean parser
        # yields nothing rather than a short read.
        pkts = parse_gyro_packet(payload[:cut], 0.0)
        assert isinstance(pkts, list)


def test_repeat_overruns_buffer():
    good = strm(K(b"SCAL", "s", 2, 1, i16be(939)), gyro_klv())
    evil = b"GYRO" + bytes([ord("s"), 255]) + (65535).to_bytes(2, "big")
    payload = K(b"DEVC", 0, 1, len(good) + len(evil), good + evil)
    pkts = parse_gyro_packet(payload, 0.0)
    # The overrunning KLV is dropped; the valid sibling stream survives.
    assert len(pkts) == 1
    np.testing.assert_allclose(
        pkts[0].samples, np.asarray(GYRO_RAW, np.float64) / 939.0)


def test_pathological_nesting_rejected_cleanly():
    """A container-per-8-bytes chain (depth ~4000) must not hit the
    Python recursion limit — depth-capped, yields no packets."""
    depth = 4000
    body = K(b"SCAL", "s", 2, 1, i16be(1))
    for _ in range(depth):
        body = K(b"STRM", 0, 1, len(body), body)
    assert parse_gyro_packet(body, 0.0) == []


def test_zero_size_klvs_make_progress():
    """size=0/repeat=0 KLVs advance the cursor (no infinite loop)."""
    payload = devc(strm(
        K(b"EMPT", "L", 0, 0, b""),
        K(b"EMPT", "L", 0, 65535, b""),
        K(b"SCAL", "s", 2, 1, i16be(939)),
        gyro_klv(),
    ))
    pkts = parse_gyro_packet(payload, 0.0)
    assert len(pkts) == 1


def test_iter_klv_fuzz_never_raises():
    """Random byte soup through the KLV iterator and the packet walk:
    structure errors must surface as empty results, never exceptions."""
    rng = np.random.default_rng(1234)
    keys = [b"DEVC", b"STRM", b"GYRO", b"SCAL", b"TSMP", b"\xff\x00\x01\x02"]
    for trial in range(200):
        n = int(rng.integers(0, 200))
        buf = bytearray(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        # Seed real-looking keys/containers at random offsets so the
        # fuzz reaches the nested-walk paths, not just header rejection.
        for key in rng.choice(len(keys), size=3):
            if n > 8:
                off = int(rng.integers(0, n - 4))
                buf[off:off + 4] = keys[int(key)]
        list(iter_klv(bytes(buf)))
        parse_gyro_packet(bytes(buf), 0.0)
        parse_sensor_packet(bytes(buf), 0.0, b"ACCL")
