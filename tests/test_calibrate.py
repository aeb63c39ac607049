"""Calibration: recover known synthetic intrinsics (the reference's only
quantitative self-check is the calibration RMS reprojection error,
``opencv/camera_calibration/camera_calibration.cpp:600-606``)."""

import numpy as np

import jax.numpy as jnp

from video_annotator_tpu import so3
from video_annotator_tpu.calibrate import _project, calibrate
from video_annotator_tpu.camera import CameraModel


def _synthetic_views(true_params, obj, n_views, model, seed=0):
    rng = np.random.default_rng(seed)
    rvecs = rng.normal(size=(n_views, 3)) * 0.25
    tvecs = np.stack(
        [
            rng.normal(size=n_views) * 0.3,
            rng.normal(size=n_views) * 0.3,
            3.0 + rng.uniform(size=n_views),
        ],
        axis=1,
    )
    params = dict(true_params)
    params["rvec"] = jnp.asarray(rvecs, jnp.float32)
    params["tvec"] = jnp.asarray(tvecs, jnp.float32)
    return np.asarray(_project(params, jnp.asarray(obj, jnp.float32), model))


def test_calibrate_recovers_fisheye_intrinsics():
    w, h = 640, 480
    true = {
        "fx": jnp.float32(300.0),
        "fy": jnp.float32(302.0),
        "cx": jnp.float32(321.0),
        "cy": jnp.float32(238.0),
        "dist": jnp.asarray([0.03, -0.01, 0.0, 0.0], jnp.float32),
    }
    # 9x6 board, unit squares (the reference's in_VID5.xml geometry).
    xs, ys = np.meshgrid(np.arange(9), np.arange(6))
    obj = np.stack([xs.ravel() - 4, ys.ravel() - 2.5, np.zeros(54)], axis=1)
    img = np.array(
        _synthetic_views(true, obj, n_views=12, model=CameraModel.FISHEYE)
    )
    img += np.random.default_rng(1).normal(size=img.shape) * 0.05  # det. noise

    cam, rms = calibrate(obj, img, (w, h), CameraModel.FISHEYE, steps=3000)
    assert rms < 0.5, rms
    assert abs(float(cam.fx) - 300.0) < 3.0, float(cam.fx)
    assert abs(float(cam.fy) - 302.0) < 3.0, float(cam.fy)
    assert abs(float(cam.cx) - 321.0) < 3.0, float(cam.cx)
    assert abs(float(cam.cy) - 238.0) < 3.0, float(cam.cy)


def test_calibrate_corner_origin_board_close_range():
    """Regression: a corner-origin board (a point exactly on the optical
    axis) at close range (z under one board diagonal) NaN'd the solver —
    sqrt/divide autodiff at r=0 leaked NaN through jnp.where, and
    unclamped depths let iterates cross z=0."""
    from video_annotator_tpu.calibrate import calibrate
    from video_annotator_tpu.camera import camera_from_dfov

    cam = camera_from_dfov(120.0, (640, 480), CameraModel.FISHEYE)
    rng = np.random.default_rng(0)
    g = np.stack(np.meshgrid(np.arange(9), np.arange(6), indexing="xy"), -1)
    obj = np.concatenate(
        [g.reshape(-1, 2) * 0.03, np.zeros((54, 1))], 1
    )  # includes (0, 0, 0)
    imgs = []
    for _ in range(10):
        R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * 0.2)))
        t = np.array([
            rng.uniform(-0.06, 0.06), rng.uniform(-0.06, 0.06),
            rng.uniform(0.35, 0.8),
        ])
        imgs.append(np.asarray(cam.project(jnp.asarray(obj @ R.T + t))))
    img = np.stack(imgs) + rng.normal(size=(10, 54, 2)) * 0.1

    est, rms = calibrate(obj, img, (640, 480), CameraModel.FISHEYE,
                         steps=2500)
    assert np.isfinite(rms) and rms < 0.5, rms
    assert abs(float(est.fx) - float(cam.fx)) < 4.0
    assert abs(float(est.cx) - float(cam.cx)) < 4.0


def _render_board_frames(cam, poses, cols=9, rows=6):
    """Rasterize a chessboard seen through a known camera (unit squares).

    Inner corners sit at integer board coords (0..cols-1, 0..rows-1); the
    cells extend one square beyond on every side, over a white backing so
    ``findChessboardCorners`` sees the light border it requires.
    """
    import cv2
    import jax.numpy as jnp

    w, h = cam.width, cam.height
    frames = []

    def project(pts_board, R, t):
        p3 = np.concatenate([pts_board, np.zeros((len(pts_board), 1))], 1)
        uv = np.asarray(cam.project(jnp.asarray(p3 @ R.T + t, jnp.float32)))
        return np.round(uv * 16).astype(np.int32)  # shift=4 subpixel coords

    for R, t in poses:
        img = np.full((h, w), 160, np.uint8)
        m = 1.0
        backing = np.array([
            [-1 - m, -1 - m], [cols + m, -1 - m],
            [cols + m, rows + m], [-1 - m, rows + m],
        ], np.float64)
        cv2.fillConvexPoly(img, project(backing, R, t), 255, cv2.LINE_AA,
                           shift=4)
        for i in range(-1, cols):
            for j in range(-1, rows):
                if (i + j) % 2 == 0:
                    continue
                quad = np.array(
                    [[i, j], [i + 1, j], [i + 1, j + 1], [i, j + 1]],
                    np.float64,
                )
                cv2.fillConvexPoly(img, project(quad, R, t), 10,
                                   cv2.LINE_AA, shift=4)
        frames.append(cv2.GaussianBlur(img, (3, 3), 0.8))
    return frames


def test_calibrate_from_video_detection(tmp_path):
    """The reference tool's full workflow: footage of a chessboard in,
    intrinsics + RMS out (``camera_calibration.cpp:379-390,574``) — board
    DETECTION included, via this framework's own readers."""
    import jax.numpy as jnp
    from fractions import Fraction

    from video_annotator_tpu.calibrate import calibrate, detect_board_views
    from video_annotator_tpu.camera import Camera, CameraModel
    from video_annotator_tpu.io.video import VideoMeta, open_writer

    true_cam = Camera.make(
        300.0, 302.0, 321.0, 239.0, 640, 480, CameraModel.FISHEYE,
        dist=jnp.asarray([0.02, -0.005, 0.0, 0.0], jnp.float32),
    )
    rng = np.random.default_rng(4)
    poses = []
    for k in range(8):
        R = np.asarray(so3.exp(jnp.asarray(
            rng.normal(size=3) * np.array([0.22, 0.22, 0.1]), jnp.float32)))
        t = np.array([
            -4.0 + rng.uniform(-1.2, 1.2),
            -2.5 + rng.uniform(-1.0, 1.0),
            rng.uniform(11.0, 16.0),
        ])
        poses.append((R, t))
    frames = _render_board_frames(true_cam, poses)

    path = str(tmp_path / "board.y4m")
    wsink = open_writer(path, VideoMeta(640, 480, Fraction(30, 1)))
    for y in frames:
        uv = np.full((240, 320), 128, np.uint8)
        wsink.write((y, uv, uv))
    wsink.close()

    obj, img, size = detect_board_views(
        path, pattern=(9, 6), max_views=8, interval_s=0.0
    )
    assert size == (640, 480)
    assert img.shape[0] >= 6, img.shape  # most views detected
    assert obj.shape == (54, 3)

    est, rms = calibrate(obj, img, size, CameraModel.FISHEYE, steps=2500)
    assert rms < 1.0, rms
    assert abs(float(est.fx) - 300.0) < 6.0, float(est.fx)
    assert abs(float(est.fy) - 302.0) < 6.0, float(est.fy)
    assert abs(float(est.cx) - 321.0) < 8.0, float(est.cx)
    assert abs(float(est.cy) - 239.0) < 8.0, float(est.cy)
