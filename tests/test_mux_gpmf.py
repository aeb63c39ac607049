"""GPMF track muxing: build GoPro-shaped files (video + telemetry) and run
the full --gyro pipeline on them — the one integration seam the separate
video-only / telemetry-only tests cannot cover."""

from fractions import Fraction

import numpy as np
import pytest

import jax.numpy as jnp

from video_annotator_tpu import so3
from video_annotator_tpu.camera import CameraPreset, get_preset_camera
from video_annotator_tpu.io.gpmf import build_gpmf_payload, extract_gyro
from video_annotator_tpu.io.mp4 import (
    find_gpmf_track,
    mux_gpmf_track,
    parse_tracks,
)
from video_annotator_tpu.io.synthetic import render_frame
from video_annotator_tpu.io.video import VideoMeta, open_reader, open_writer
from video_annotator_tpu.pipeline.render import RenderOptions, render


def _sensor_from_camera(v):
    """Invert the default sensor->camera axis map (x=s1, y=-s2, z=-s0)."""
    return np.stack([-v[:, 2], v[:, 0], -v[:, 1]], axis=1)


def _make_gopro_like(tmp_path, n=30, fps=30.0, rate=400.0,
                     omega_cam=(0.0, 0.0, 0.25)):
    # rate=400 Hz matches real GoPro GYRO streams AND the extractor's
    # tail-packet timestamp heuristic (io/gpmf.py) — a single-payload
    # clip is all tail.
    """Video MP4 + muxed GYRO/ACCL of a constant-rate rolling camera."""
    w, h = 256, 192
    cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (w, h))
    video = str(tmp_path / "v.mp4")
    wr = open_writer(video, VideoMeta(w, h, Fraction(int(fps), 1)))
    omega = np.asarray(omega_cam)
    for i in range(n):
        # render_frame applies R to rays, so the camera pose is R^-1 and
        # the measured trajectory is M_t = R_t^T = exp(-w t) — matching
        # what integrate_gyro produces for body rate w (cf. test_gpmf).
        rot = so3.exp(jnp.asarray(omega * (i / fps), jnp.float32))
        y, u, v = render_frame(cam, rot)
        wr.write((np.asarray(y, np.uint8), np.asarray(u, np.uint8),
                  np.asarray(v, np.uint8)))
    wr.close()

    # One GPMF payload per second of footage, gyro at `rate` Hz. Gravity:
    # camera up starts at image-up and rolls with the camera.
    dur = n / fps
    per = int(rate * min(1.0, dur))
    payloads = []
    t = 0.0
    g = 9.80665
    while t < dur - 1e-9:
        k = np.arange(per) / rate + t
        gyro_cam = np.tile(omega, (per, 1))
        up_cam = np.stack([
            -np.sin(omega[2] * k), -np.cos(omega[2] * k), np.zeros(per)
        ], axis=1)
        payloads.append(build_gpmf_payload(
            _sensor_from_camera(gyro_cam),
            accl=_sensor_from_camera(up_cam * g),
        ))
        t += 1.0
    out = str(tmp_path / "gopro.mp4")
    mux_gpmf_track(video, payloads, out, timescale=1000, delta=1000)
    return out, omega, n, fps


def test_mux_creates_both_tracks(tmp_path):
    path, omega, n, fps = _make_gopro_like(tmp_path)
    handlers = {t.handler_type for t in parse_tracks(path)}
    assert b"vide" in handlers and b"meta" in handlers
    assert find_gpmf_track(path) is not None
    # Video still decodes after the surgery.
    r = open_reader(path)
    frames = sum(1 for _ in r)
    r.close()
    assert frames == n

    om, ts = extract_gyro(path)
    np.testing.assert_allclose(om, np.tile(omega, (om.shape[0], 1)),
                               atol=5e-3)
    assert ts[0] == 0.0


def test_gyro_render_on_muxed_file(tmp_path):
    """Full --gyro render: telemetry-driven stabilization on a file with
    both tracks. The gyro trajectory must match the analytic truth, and
    fixed mode must cancel the roll as well as the visual tracker does
    (perfect frame-to-frame correlation is unreachable here: 14 deg of
    bilinear resampling + lossy H.264 lowpass the fine synthetic
    texture — the visual-fixed control measures ~0.53 on this clip)."""
    path, omega, n, fps = _make_gopro_like(tmp_path)

    from video_annotator_tpu.pipeline.render import analyse_gyro

    traj = analyse_gyro(path, RenderOptions(gyro=True))
    expect = -np.outer(np.arange(n) / fps, omega)
    np.testing.assert_allclose(traj.params, expect, atol=5e-3)

    def corr(a, b):
        h, w = a.shape
        c = (slice(h // 4, -h // 4), slice(w // 4, -w // 4))
        a = a[c].astype(np.float64) - a[c].mean()
        b = b[c].astype(np.float64) - b[c].mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    def render_corr(opts):
        out = str(tmp_path / f"{opts.stabilise}_{opts.gyro}.y4m")
        render(path, out, opts)
        r = open_reader(out)
        fs = [y for y, _, _ in r]
        r.close()
        assert len(fs) == n
        return corr(fs[0], fs[-1])

    preset = dict(preset=CameraPreset.GOPRO_H4B_WIDE43_MEASURED)
    c_gyro = render_corr(RenderOptions(gyro=True, stabilise="fixed", **preset))
    c_none = render_corr(RenderOptions(stabilise="none", **preset))
    assert c_gyro > 0.4, (c_gyro, c_none)
    assert c_gyro > c_none + 0.3, (c_gyro, c_none)


def test_gyro_horizon_lock_up0_from_muxed_accl(tmp_path):
    from video_annotator_tpu.pipeline.render import analyse_gyro

    path, omega, n, fps = _make_gopro_like(tmp_path)
    traj = analyse_gyro(path, RenderOptions(gyro=True, horizon_lock=True))
    assert traj.num_frames == n
    # Gravity at t=0 is straight image-up in camera coords.
    assert traj.up0 is not None
    assert np.dot(traj.up0, [0.0, -1.0, 0.0]) > 0.99, traj.up0


def test_mux_rejects_faststart(tmp_path):
    # moov-first layout must be refused, not silently corrupted.
    video = str(tmp_path / "v.mp4")
    w = open_writer(video, VideoMeta(64, 48, Fraction(30, 1)))
    for _ in range(3):
        w.write((np.zeros((48, 64), np.uint8),
                 np.full((24, 32), 128, np.uint8),
                 np.full((24, 32), 128, np.uint8)))
    w.close()
    data = open(video, "rb").read()
    import struct

    boxes = []
    pos = 0
    while pos + 8 <= len(data):
        size, typ = struct.unpack_from(">I4s", data, pos)
        boxes.append((typ, data[pos:pos + size]))
        pos += size
    moov = next(b for t, b in boxes if t == b"moov")
    rest = b"".join(b for t, b in boxes if t != b"moov")
    bad = str(tmp_path / "faststart.mp4")
    with open(bad, "wb") as f:
        f.write(moov + rest)
    with pytest.raises(ValueError, match="moov"):
        mux_gpmf_track(bad, [b"\x00" * 16], str(tmp_path / "o.mp4"))


def test_analyse_gyro_honors_trim(tmp_path):
    """Gyro trajectories must cover exactly the trimmed frame range and
    rebase at its first frame (encode indexes corrections from there)."""
    from video_annotator_tpu.pipeline.render import RenderOptions, analyse_gyro

    path, omega, n, fps = _make_gopro_like(tmp_path)
    full = analyse_gyro(path, RenderOptions(gyro=True))
    k = 6
    trimmed = analyse_gyro(
        path, RenderOptions(gyro=True, start=k / fps)
    )
    assert full.num_frames == n
    assert trimmed.num_frames == n - k
    np.testing.assert_allclose(trimmed.params[0], 0.0, atol=1e-6)
    # Trimmed trajectory == full trajectory rebased at frame k.
    Rf = so3.exp(jnp.asarray(full.params, jnp.float32))
    expect = np.asarray(so3.matmul(
        Rf[k:], jnp.swapaxes(Rf[k], -1, -2)[None]
    ))
    got = np.asarray(so3.exp(jnp.asarray(trimmed.params, jnp.float32)))
    np.testing.assert_allclose(got, expect, atol=1e-4)
