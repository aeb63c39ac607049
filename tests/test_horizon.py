"""Horizon lock: ACCL parsing, gravity estimation, roll leveling."""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp
import pytest

from video_annotator_tpu import so3
from video_annotator_tpu.io.gpmf import (
    build_gpmf_payload,
    extract_accl,
    gyro_to_camera,
    parse_sensor_packet,
)
from video_annotator_tpu.smoothing.horizon import (
    GRAVITY,
    estimate_up_direction,
    level_horizon,
)

from test_gpmf import write_minimal_gpmf_mp4


def _random_rotations(n, scale=0.5, seed=0):
    rng = np.random.default_rng(seed)
    return np.asarray(so3.exp(jnp.asarray(rng.normal(size=(n, 3)) * scale,
                                          jnp.float32)))


def test_level_horizon_zeros_roll():
    up0 = np.asarray([0.0, -1.0, 0.0])
    virtual = jnp.asarray(_random_rotations(32), jnp.float32)
    leveled = level_horizon(virtual, jnp.asarray(up0, jnp.float32))
    u = np.einsum("tij,j->ti", np.asarray(leveled), up0)
    # World up projects exactly onto image-up: no x component, y negative.
    np.testing.assert_allclose(u[:, 0], 0.0, atol=1e-5)
    assert (u[:, 1] < 0).all()
    # Still rotations.
    prod = np.einsum("tij,tkj->tik", np.asarray(leveled), np.asarray(leveled))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-5)


def test_level_horizon_only_rolls_about_optical_axis():
    virtual = jnp.asarray(_random_rotations(16, seed=3), jnp.float32)
    leveled = level_horizon(virtual, jnp.asarray([0.0, -1.0, 0.0], jnp.float32))
    # leveled = Rz . virtual, so leveled @ virtual^T fixes e_z.
    rz = np.einsum("tij,tkj->tik", np.asarray(leveled), np.asarray(virtual))
    np.testing.assert_allclose(rz[:, :, 2], np.tile([0, 0, 1.0], (16, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(rz[:, 2, :], np.tile([0, 0, 1.0], (16, 1)),
                               atol=1e-5)


def test_level_horizon_degenerate_pose_keeps_roll():
    # Camera pointing straight down: up0 along +z in camera coords.
    virtual = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    leveled = level_horizon(virtual, jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(leveled), np.asarray(virtual),
                               atol=1e-6)


def test_estimate_up_direction_recovers_gravity():
    rng = np.random.default_rng(5)
    u0 = np.asarray([0.3, -0.9, 0.2])
    u0 /= np.linalg.norm(u0)

    s = 600
    ts = np.arange(s) / 200.0
    omega = rng.normal(size=(s, 3)) * 0.8  # wobbling camera

    from video_annotator_tpu.smoothing.gyro import integrate_gyro

    accl_ts = ts[::3]
    t0 = 0.0
    R = np.asarray(
        integrate_gyro(
            jnp.asarray(omega, jnp.float32),
            jnp.asarray(ts, jnp.float32),
            jnp.asarray(np.concatenate([[t0], accl_ts]), jnp.float32),
        )
    )
    measured = np.swapaxes(R[1:], -1, -2)  # M_t = R_t^-1 (pipeline rebase)
    accl = np.einsum("tij,j->ti", measured, u0 * GRAVITY)
    accl += rng.normal(size=accl.shape) * 0.05

    # Inject high-dynamics outliers that the |a|-gate must discount.
    accl[::50] += rng.normal(size=accl[::50].shape) * 30.0

    up = estimate_up_direction(omega, ts, accl, accl_ts, t0=t0)
    assert np.dot(up, u0) > 0.999, (up, u0)


def test_accl_payload_and_extract(tmp_path):
    rng = np.random.default_rng(2)
    gyro = rng.uniform(-2, 2, (20, 3))
    accl = rng.uniform(-12, 12, (10, 3))
    payload = build_gpmf_payload(gyro, accl=accl)

    g = parse_sensor_packet(payload, 0.0, b"GYRO")
    a = parse_sensor_packet(payload, 0.0, b"ACCL")
    assert len(g) == 1 and len(a) == 1
    np.testing.assert_allclose(g[0].samples, gyro, atol=1e-2)
    np.testing.assert_allclose(a[0].samples, accl, atol=1e-2)

    path = str(tmp_path / "imu.mp4")
    write_minimal_gpmf_mp4(
        path, [build_gpmf_payload(gyro, accl=accl) for _ in range(3)]
    )
    vals, ats = extract_accl(path)
    assert vals.shape == (30, 3)
    np.testing.assert_allclose(vals[:10], gyro_to_camera(accl), atol=1e-2)
    assert ats[0] == 0.0


def test_trajectory_roundtrip_with_up0(tmp_path):
    from video_annotator_tpu.pipeline.trajectory import Trajectory

    up0 = np.asarray([0.1, -0.99, 0.0])
    up0 /= np.linalg.norm(up0)
    traj = Trajectory(params=np.zeros((5, 3)), kind="so3",
                      fps=Fraction(30, 1), up0=up0)
    p = str(tmp_path / "t.traj.npz")
    traj.save(p)
    back = Trajectory.load(p)
    np.testing.assert_allclose(back.up0, up0)
    # And absent stays absent.
    traj2 = Trajectory(params=np.zeros((5, 3)), kind="so3")
    traj2.save(p)
    assert Trajectory.load(p).up0 is None


def test_corrections_horizon_lock_pure_roll_cancelled():
    """stabilise=none + horizon lock = pure per-frame roll leveling."""
    from video_annotator_tpu.pipeline.render import (
        RenderOptions,
        compute_corrections,
    )
    from video_annotator_tpu.pipeline.trajectory import Trajectory

    t = 24
    rolls = np.linspace(0, 0.4, t)
    rotvecs = np.stack([np.zeros(t), np.zeros(t), rolls], axis=1)
    traj = Trajectory(params=rotvecs, kind="so3")

    opts = RenderOptions(stabilise="none", horizon_lock=True)
    corr = compute_corrections(traj, opts)
    # Pure-roll trajectory: correction must cancel the full roll (equal the
    # measured rotation), and must always be a rotation about +z.
    np.testing.assert_allclose(corr, traj.rotations(), atol=1e-5)

    # Mixed trajectory: corrections stay pure optical-axis rolls.
    rng = np.random.default_rng(1)
    rotvecs = rng.normal(size=(t, 3)) * 0.2
    traj = Trajectory(params=rotvecs, kind="so3")
    corr = compute_corrections(traj, opts)
    np.testing.assert_allclose(corr[:, :, 2], np.tile([0, 0, 1.0], (t, 1)),
                               atol=1e-5)

    # Without the flag, stabilise=none stays identity.
    corr = compute_corrections(traj, RenderOptions(stabilise="none"))
    np.testing.assert_allclose(
        corr, np.broadcast_to(np.eye(3), (t, 3, 3)), atol=1e-7
    )


def test_corrections_horizon_lock_smooth_levels_virtual_camera():
    from video_annotator_tpu.pipeline.render import (
        RenderOptions,
        compute_corrections,
    )
    from video_annotator_tpu.pipeline.trajectory import Trajectory

    t = 40
    rng = np.random.default_rng(4)
    rotvecs = np.cumsum(rng.normal(size=(t, 3)) * 0.01, axis=0)
    up0 = np.asarray([0.05, -0.99, 0.05])
    up0 /= np.linalg.norm(up0)
    traj = Trajectory(params=rotvecs, kind="so3", up0=up0)

    opts = RenderOptions(stabilise="smooth", stabilise_radius=8,
                         horizon_lock=True)
    corr = np.asarray(
        compute_corrections(traj, opts), np.float64
    )
    measured = traj.rotations()
    # virtual = corr^T . measured; its up must be level for every frame.
    virtual = np.einsum("tji,tjk->tik", corr, measured)
    u = np.einsum("tij,j->ti", virtual, up0)
    np.testing.assert_allclose(u[:, 0], 0.0, atol=1e-4)
    assert (u[:, 1] < 0).all()


def test_analyse_gyro_populates_up0(tmp_path):
    """Telemetry-only MP4 with GYRO+ACCL: analyse_gyro estimates gravity."""
    from video_annotator_tpu.pipeline.render import RenderOptions, analyse_gyro

    # Static camera rolled 30 deg: up in camera coords.
    u0 = np.asarray([np.sin(np.pi / 6), -np.cos(np.pi / 6), 0.0])
    accl_cam = np.tile(u0 * GRAVITY, (20, 1))
    # Invert the sensor->camera axis map (x_cam=s1, y_cam=-s2, z_cam=-s0).
    accl_raw = np.stack(
        [-accl_cam[:, 2], accl_cam[:, 0], -accl_cam[:, 1]], axis=1
    )
    gyro_raw = np.zeros((40, 3))

    path = str(tmp_path / "imu.mp4")
    write_minimal_gpmf_mp4(
        path, [build_gpmf_payload(gyro_raw, accl=accl_raw) for _ in range(3)]
    )
    traj = analyse_gyro(path, RenderOptions(gyro=True, horizon_lock=True))
    assert traj.up0 is not None
    # Estimation is gated on the lock (pure cost otherwise).
    assert analyse_gyro(path, RenderOptions(gyro=True)).up0 is None
    assert np.dot(traj.up0, u0) > 0.999, (traj.up0, u0)


def test_render_horizon_lock_cancels_roll(tmp_path):
    """Full render: --horizon-lock with stabilise=none must run analysis
    (the wiring bug this guards) and counter-roll the output."""
    from video_annotator_tpu.camera import CameraPreset, get_preset_camera
    from video_annotator_tpu.io.synthetic import render_frame
    from video_annotator_tpu.io.video import VideoMeta, open_reader, open_writer
    from video_annotator_tpu.pipeline.render import RenderOptions, render

    W, H, N = 256, 192, 16
    cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (W, H))
    src = str(tmp_path / "roll.y4m")
    w = open_writer(src, VideoMeta(W, H, Fraction(30, 1)))
    for r in np.linspace(0.0, 0.08, N):
        y, u, v = render_frame(cam, so3.exp(jnp.asarray([0, 0, r], jnp.float32)))
        w.write((np.asarray(y, np.uint8), np.asarray(u, np.uint8),
                 np.asarray(v, np.uint8)))
    w.close()

    opts = dict(preset=CameraPreset.GOPRO_H4B_WIDE43_MEASURED)
    out_plain = str(tmp_path / "plain.y4m")
    out_lock = str(tmp_path / "lock.y4m")
    render(src, out_plain, RenderOptions(stabilise="none", **opts))
    render(src, out_lock,
           RenderOptions(stabilise="none", horizon_lock=True, **opts))

    def center_corr(path):
        r = open_reader(path)
        fs = [y for y, _, _ in r]
        r.close()
        a, b = fs[0].astype(np.float64), fs[-1].astype(np.float64)
        h, w_ = a.shape
        c = (slice(h // 4, -h // 4), slice(w_ // 4, -w_ // 4))
        a, b = a[c] - a[c].mean(), b[c] - b[c].mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    c_plain = center_corr(out_plain)
    c_lock = center_corr(out_lock)
    assert c_lock > c_plain + 0.2, (c_plain, c_lock)


def test_horizon_lock_rejects_2d_families(tmp_path):
    from video_annotator_tpu.pipeline.render import RenderOptions, render

    with pytest.raises(ValueError, match="horizon-lock"):
        render("synthetic://shaky?w=64&h=48&n=4", str(tmp_path / "o.y4m"),
               RenderOptions(filter="vidstab", horizon_lock=True))


def test_cli_maps_horizon_lock():
    from video_annotator_tpu.cli import _render_options, build_parser

    args = build_parser().parse_args(
        ["render", "in.mp4", "out.mp4", "--horizon-lock"]
    )
    assert _render_options(args).horizon_lock is True
    args = build_parser().parse_args(["render", "in.mp4", "out.mp4"])
    assert _render_options(args).horizon_lock is False
