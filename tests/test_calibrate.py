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
