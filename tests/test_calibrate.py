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
