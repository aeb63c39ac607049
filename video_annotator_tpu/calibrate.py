"""Camera intrinsic calibration by differentiable bundle adjustment.

Replaces the reference's OpenCV-sample calibration tool
(``opencv/camera_calibration/camera_calibration.cpp``: chessboard views ->
``fisheye::calibrate`` at ``:574`` / ``calibrateCameraRO`` at ``:587-589``,
reporting RMS reprojection error at ``:488,600-606``). TPU-native approach:
the projection model is already differentiable JAX code (``camera.py``), so
calibration is plain gradient-based nonlinear least squares over
(fx, fy, cx, cy, k1..k4, per-view pose) — no bespoke solver, and the same
code path that runs in the pipeline is the one being calibrated.

Input: a video to detect a chessboard in (the reference tool's workflow —
its settings point ``Input`` at GoPro footage of a 9x6 board,
``opencv/camera_calibration/in_VID5.xml``; detection + subpixel refinement
as in ``camera_calibration.cpp:379-390``), or an ``.npz`` with
``object_points`` (N, 3) board coordinates and ``image_points`` (V, N, 2)
pre-extracted detections per view.
"""

from __future__ import annotations

import json
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_annotator_tpu import so3
from video_annotator_tpu.camera import Camera, CameraModel


def _project(params, obj_pts, model: CameraModel):
    """Project board points through pose + intrinsics."""
    fx, fy, cx, cy = params["fx"], params["fy"], params["cx"], params["cy"]
    dist = params["dist"]
    rvecs, tvecs = params["rvec"], params["tvec"]  # (V, 3)

    R = so3.exp(rvecs)  # (V, 3, 3)
    cam_pts = (
        jnp.einsum("vij,nj->vni", R, obj_pts, precision=jax.lax.Precision.HIGHEST)
        + tvecs[:, None, :]
    )
    # Clamp the depth: an optimizer iterate that momentarily pushes a
    # board point to z <= 0 must produce a large finite residual, not a
    # NaN that permanently poisons every parameter (close boards, z well
    # under one board diagonal, hit this; far boards never do).
    z = jnp.maximum(cam_pts[..., 2], 1e-2)
    x = cam_pts[..., 0] / z
    y = cam_pts[..., 1] / z
    if model == CameraModel.FISHEYE:
        # Double-where: a board point exactly on the optical axis (r = 0,
        # e.g. a corner-origin board facing the camera) must not leak NaN
        # through sqrt'(0)/x/0 into the AUTODIFF gradients — jnp.where
        # alone evaluates both branches' cotangents.
        r2 = x * x + y * y
        on_axis = r2 < 1e-18
        r = jnp.sqrt(jnp.where(on_axis, 1.0, r2))
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (
            1.0 + t2 * (dist[0] + t2 * (dist[1] + t2 * (dist[2] + t2 * dist[3])))
        )
        s = jnp.where(on_axis, 1.0, theta_d / r)
        x, y = x * s, y * s
    u = fx * x + cx
    v = fy * y + cy
    return jnp.stack([u, v], axis=-1)  # (V, N, 2)


def calibrate(
    object_points: np.ndarray,  # (N, 3)
    image_points: np.ndarray,  # (V, N, 2)
    image_size: Tuple[int, int],
    model: CameraModel = CameraModel.FISHEYE,
    steps: int = 4000,
) -> Tuple[Camera, float]:
    """Fit intrinsics + per-view poses; returns (camera, rms_error_px)."""
    v = image_points.shape[0]
    w, h = image_size
    obj = jnp.asarray(object_points, jnp.float32)
    img = jnp.asarray(image_points, jnp.float32)

    # Initialization: principal point at center, focal from a 90-degree
    # dfov guess, boards roughly 1 board-diagonal in front of the camera.
    diag = float(np.linalg.norm(object_points.max(0) - object_points.min(0)))
    params = {
        "fx": jnp.asarray(0.8 * w, jnp.float32),
        "fy": jnp.asarray(0.8 * w, jnp.float32),
        "cx": jnp.asarray((w - 1) / 2.0, jnp.float32),
        "cy": jnp.asarray((h - 1) / 2.0, jnp.float32),
        "dist": jnp.zeros(4, jnp.float32),
        "rvec": jnp.zeros((v, 3), jnp.float32),
        "tvec": jnp.tile(
            jnp.asarray([0.0, 0.0, max(diag, 1.0)], jnp.float32), (v, 1)
        ),
    }

    def loss(p):
        pred = _project(p, obj, model)
        return jnp.mean(jnp.sum((pred - img) ** 2, axis=-1))

    import optax

    # Two-stage schedule: poses+focal first converge fast, distortion after.
    opt = optax.adam(learning_rate=optax.exponential_decay(0.05, 1000, 0.5))
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        updates, s = opt.update(g, s)
        # Scale pixel-unit params up (adam is scale-free, but keep cx/cy and
        # focals moving at pixel scale).
        for k in ("fx", "fy", "cx", "cy"):
            updates[k] = updates[k] * 100.0
        p = optax.apply_updates(p, updates)
        return p, s

    for _ in range(steps):
        params, state = step(params, state)

    params = _lm_refine(params, obj, img, model)
    rms = float(jnp.sqrt(loss(params)))
    cam = Camera.make(
        params["fx"], params["fy"], params["cx"], params["cy"], w, h, model,
        dist=params["dist"],
    )
    return cam, rms


def _lm_refine(params, obj, img, model: CameraModel, iters: int = 40):
    """Levenberg-Marquardt polish of the adam solution.

    Adam finds the basin but crawls on calibration's ill-conditioned
    focal/distortion/depth trade-off (hundreds of px RMS per 1000 steps
    near the optimum); LM on the same jax-differentiated residuals
    converges it to the noise floor in a few dozen normal-equation
    solves (the problem is tiny: ~8 + 6V parameters).
    """
    from jax.flatten_util import ravel_pytree

    p0, unravel = ravel_pytree(params)

    def resid(p):
        return (_project(unravel(p), obj, model) - img).ravel()

    res_j = jax.jit(resid)
    jac_j = jax.jit(jax.jacfwd(resid))

    p = np.asarray(p0, np.float64)
    r = np.asarray(res_j(jnp.asarray(p, jnp.float32)), np.float64)
    cost = float(r @ r)
    lam = 1e-3
    for _ in range(iters):
        J = np.asarray(jac_j(jnp.asarray(p, jnp.float32)), np.float64)
        jtj = J.T @ J
        g = J.T @ r
        scale = np.diag(np.maximum(np.diag(jtj), 1e-8))
        improved = False
        for _ in range(8):
            try:
                delta = np.linalg.solve(jtj + lam * scale, -g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            p_new = p + delta
            r_new = np.asarray(
                res_j(jnp.asarray(p_new, jnp.float32)), np.float64
            )
            c_new = float(r_new @ r_new)
            if c_new < cost:
                p, r, cost = p_new, r_new, c_new
                lam = max(lam * 0.3, 1e-10)
                improved = True
                break
            lam *= 10.0
        if not improved:
            break
    return unravel(jnp.asarray(p, jnp.float32))


def board_object_points(cols: int, rows: int, square_size: float = 1.0):
    """(cols*rows, 3) inner-corner board coordinates (z = 0)."""
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack(
        [xs.ravel(), ys.ravel(), np.zeros(cols * rows)], axis=1
    ).astype(np.float64) * float(square_size)


def detect_board_views(
    source: str,
    pattern: Tuple[int, int] = (9, 6),
    square_size: float = 1.0,
    max_views: int = 25,
    interval_s: float = 0.25,
):
    """Detect chessboard inner corners across a video's frames.

    The reference tool's capture loop (``camera_calibration.cpp:379-390``):
    ``findChessboardCorners`` with adaptive threshold + normalization, then
    ``cornerSubPix`` refinement, sampling views at least ``interval_s``
    apart until ``max_views`` are collected. Decoding runs through this
    framework's readers (luma plane only — detection is grayscale).

    Returns ``(object_points (N, 3), image_points (V, N, 2), (w, h))``.
    """
    import cv2

    from video_annotator_tpu.io.video import open_reader

    cols, rows = pattern
    reader = open_reader(source)
    meta = reader.meta
    stride = max(1, int(round(interval_s * float(meta.fps))))
    flags = cv2.CALIB_CB_ADAPTIVE_THRESH | cv2.CALIB_CB_NORMALIZE_IMAGE
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_COUNT, 30, 0.01)
    views = []
    try:
        for i, (y, _, _) in enumerate(iter(reader)):
            if i % stride:
                continue
            found, corners = cv2.findChessboardCorners(y, (cols, rows), flags)
            if not found:
                continue
            corners = cv2.cornerSubPix(
                y, corners, (11, 11), (-1, -1), crit
            )
            views.append(corners.reshape(-1, 2))
            if len(views) >= max_views:
                break
    finally:
        reader.close()
    if len(views) < 3:
        raise ValueError(
            f"found a {cols}x{rows} chessboard in only {len(views)} frames "
            f"of {source}; calibration needs at least 3 views"
        )
    obj = board_object_points(cols, rows, square_size)
    return obj, np.stack(views), (meta.width, meta.height)


def calibrate_cli(points_path: str, model: str, size: str | None,
                  output: str | None, board: str = "9x6",
                  square_size: float = 1.0, max_views: int = 25,
                  interval_s: float = 0.25):
    if points_path.endswith(".npz"):
        data = np.load(points_path)
        obj = data["object_points"]
        img = data["image_points"]
        detected = None
    else:
        cols, rows = (int(x) for x in board.lower().split("x"))
        obj, img, detected = detect_board_views(
            points_path, (cols, rows), square_size,
            max_views=max_views, interval_s=interval_s,
        )
        print(f"detected {img.shape[0]} board views in {points_path}")
        data = {}
    if obj.ndim == 3:
        # cv2-style per-view board lists (V, N, 3): all views observe the
        # same board, so one copy suffices.
        obj = obj[0]
    if size:
        w, h = (int(x) for x in size.lower().split("x"))
    elif detected is not None:
        w, h = detected
    elif "image_size" in data:
        w, h = (int(x) for x in data["image_size"])
    else:
        w = int(np.ceil(img[..., 0].max())) + 1
        h = int(np.ceil(img[..., 1].max())) + 1
    cam, rms = calibrate(
        obj, img, (w, h),
        CameraModel.FISHEYE if model == "fisheye" else CameraModel.RECTILINEAR,
    )
    result = {
        "model": cam.model.value,
        "fx": float(cam.fx), "fy": float(cam.fy),
        "cx": float(cam.cx), "cy": float(cam.cy),
        "dist": [float(d) for d in np.asarray(cam.dist)],
        "width": w, "height": h,
        "views": int(img.shape[0]),
        "rms_reprojection_error_px": rms,
    }
    text = json.dumps(result, indent=2)
    print(text)
    if output:
        with open(output, "w") as f:
            f.write(text + "\n")
