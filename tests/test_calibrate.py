"""Calibration: recover known synthetic intrinsics (the reference's only
quantitative self-check is the calibration RMS reprojection error,
``opencv/camera_calibration/camera_calibration.cpp:600-606``)."""

import numpy as np
import pytest

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

# ---------------------------------------------------------------------------
# Pattern parity: circles grids + settings files (camera_calibration.cpp
# :25-75 Settings, :356-363 detection switch, :527-540 board coordinates)
# ---------------------------------------------------------------------------


def _render_circle_frames(cam, poses, obj, radius_world=0.35):
    """Rasterize dark calibration circles (at board coords ``obj``) on a
    white backing through a known camera — what ``findCirclesGrid``'s
    default blob detector expects."""
    import cv2
    import jax.numpy as jnp

    w, h = cam.width, cam.height
    frames = []
    for R, t in poses:
        img = np.full((h, w), 255, np.uint8)
        p3 = obj @ R.T + t
        uv = np.asarray(cam.project(jnp.asarray(p3, jnp.float32)))
        # Per-circle pixel radius from the local projection scale.
        edge = (obj + np.array([radius_world, 0.0, 0.0])) @ R.T + t
        uve = np.asarray(cam.project(jnp.asarray(edge, jnp.float32)))
        radii = np.linalg.norm(uve - uv, axis=1)
        for (u, v), r in zip(uv, radii):
            cv2.circle(img, (int(round(u * 16)), int(round(v * 16))),
                       int(round(r * 16)), 10, -1, cv2.LINE_AA, shift=4)
        frames.append(cv2.GaussianBlur(img, (3, 3), 0.8))
    return frames


def _match_order(detected, truth):
    """Undo findCirclesGrid's 180-degree ordering ambiguity per view."""
    if np.linalg.norm(detected - truth) > np.linalg.norm(detected[::-1] - truth):
        return detected[::-1].copy()
    return detected


def _circle_grid_views(pattern_type, cols, rows, n_views=10, seed=7):
    import jax.numpy as jnp

    from video_annotator_tpu.calibrate import (
        board_object_points,
        detect_pattern,
    )
    from video_annotator_tpu.camera import Camera, CameraModel

    true_cam = Camera.make(
        300.0, 302.0, 321.0, 239.0, 640, 480, CameraModel.FISHEYE,
        dist=jnp.asarray([0.02, -0.005, 0.0, 0.0], jnp.float32),
    )
    obj = board_object_points(cols, rows, 1.0, pattern_type)
    center = obj.mean(0)
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n_views):
        R = np.asarray(so3.exp(jnp.asarray(
            rng.normal(size=3) * np.array([0.18, 0.18, 0.08]), jnp.float32)))
        t = np.array([
            rng.uniform(-1.0, 1.0) - center[0],
            rng.uniform(-1.0, 1.0) - center[1],
            rng.uniform(11.0, 16.0),
        ])
        poses.append((R, t))
    frames = _render_circle_frames(true_cam, poses, obj)

    views = []
    for (R, t), frame in zip(poses, frames):
        pts = detect_pattern(frame, (cols, rows), pattern_type)
        if pts is None:
            continue
        truth = np.asarray(true_cam.project(
            jnp.asarray(obj @ R.T + t, jnp.float32)))
        views.append(_match_order(pts, truth))
    return true_cam, obj, views


def test_circles_grid_calibration():
    """Symmetric circles grid: detect + recover intrinsics within ~1 px
    (the chessboard test's bound), per VERDICT round-1 item 5."""
    from video_annotator_tpu.calibrate import PatternType, calibrate
    from video_annotator_tpu.camera import CameraModel

    true_cam, obj, views = _circle_grid_views(
        PatternType.CIRCLES_GRID, 7, 5)
    assert len(views) >= 7, len(views)
    est, rms = calibrate(obj, np.stack(views), (640, 480),
                         CameraModel.FISHEYE, steps=2500)
    assert rms < 1.0, rms
    assert abs(float(est.fx) - 300.0) < 6.0, float(est.fx)
    assert abs(float(est.fy) - 302.0) < 6.0, float(est.fy)
    assert abs(float(est.cx) - 321.0) < 8.0, float(est.cx)
    assert abs(float(est.cy) - 239.0) < 8.0, float(est.cy)


def test_asymmetric_circles_grid_calibration():
    """Asymmetric circles grid: staggered board coordinates
    (camera_calibration.cpp:536-539) + detection + recovery."""
    from video_annotator_tpu.calibrate import (
        PatternType,
        board_object_points,
        calibrate,
    )
    from video_annotator_tpu.camera import CameraModel

    # The staggered coordinate formula itself.
    obj = board_object_points(4, 11, 2.0, PatternType.ASYMMETRIC_CIRCLES_GRID)
    assert obj.shape == (44, 3)
    np.testing.assert_allclose(obj[0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(obj[4], [2.0, 2.0, 0.0])   # row 1 staggered
    np.testing.assert_allclose(obj[5], [6.0, 2.0, 0.0])

    true_cam, obj, views = _circle_grid_views(
        PatternType.ASYMMETRIC_CIRCLES_GRID, 4, 11)
    assert len(views) >= 7, len(views)
    est, rms = calibrate(obj, np.stack(views), (640, 480),
                         CameraModel.FISHEYE, steps=2500)
    assert rms < 1.0, rms
    assert abs(float(est.fx) - 300.0) < 6.0, float(est.fx)
    assert abs(float(est.cy) - 239.0) < 8.0, float(est.cy)


def test_settings_xml_roundtrip_and_reference_format(tmp_path):
    """Read the reference's own settings schema (quoted strings included)
    and round-trip ours through FileStorage XML."""
    from video_annotator_tpu.calibrate import CalibrationSettings, PatternType

    # A settings file in the reference's exact format (in_VID5.xml).
    ref_xml = tmp_path / "in.xml"
    ref_xml.write_text("""<?xml version="1.0"?>
<opencv_storage>
<Settings>
  <BoardSize_Width> 9</BoardSize_Width>
  <BoardSize_Height>6</BoardSize_Height>
  <Square_Size>50</Square_Size>
  <Calibrate_Pattern>"ASYMMETRIC_CIRCLES_GRID"</Calibrate_Pattern>
  <Input>"/tmp/clip.MP4"</Input>
  <Input_FlipAroundHorizontalAxis>1</Input_FlipAroundHorizontalAxis>
  <Input_Delay>100</Input_Delay>
  <Calibrate_NrOfFrameToUse>25</Calibrate_NrOfFrameToUse>
  <Calibrate_FixAspectRatio> 1 </Calibrate_FixAspectRatio>
  <Calibrate_AssumeZeroTangentialDistortion>1</Calibrate_AssumeZeroTangentialDistortion>
  <Calibrate_FixPrincipalPointAtTheCenter> 0 </Calibrate_FixPrincipalPointAtTheCenter>
  <Write_outputFileName>"out_camera_data.xml"</Write_outputFileName>
  <Write_DetectedFeaturePoints>1</Write_DetectedFeaturePoints>
  <Write_extrinsicParameters>1</Write_extrinsicParameters>
  <Write_gridPoints>1</Write_gridPoints>
  <Show_UndistortedImage>1</Show_UndistortedImage>
  <Calibrate_UseFisheyeModel>1</Calibrate_UseFisheyeModel>
  <Fix_K1>1</Fix_K1>
  <Fix_K2>0</Fix_K2>
  <Fix_K3>1</Fix_K3>
</Settings>
</opencv_storage>
""")
    s = CalibrationSettings.read(str(ref_xml))
    assert s.board_width == 9 and s.board_height == 6
    assert s.square_size == 50.0
    assert s.pattern == PatternType.ASYMMETRIC_CIRCLES_GRID
    assert s.input == "/tmp/clip.MP4"
    assert s.flip_vertical is True
    assert s.nr_frames == 25
    assert s.fix_aspect_ratio == 1.0
    assert s.fix_principal_point is False
    assert s.use_fisheye is True
    assert s.output_file == "out_camera_data.xml"
    assert s.fix_k == (True, False, True, False, False)

    # Round-trip through our writer (XML and YAML).
    for name in ("rt.xml", "rt.yml"):
        out = tmp_path / name
        s.write(str(out))
        s2 = CalibrationSettings.read(str(out))
        assert s2 == s, (name, s2)


def test_run_from_settings_image_list(tmp_path):
    """End-to-end reference workflow from a settings file: IMAGE_LIST
    input (camera_calibration.cpp:105-110), circles-grid detection,
    calibration, FileStorage output readable by OpenCV."""
    import cv2
    import jax.numpy as jnp

    from video_annotator_tpu.calibrate import (
        PatternType,
        board_object_points,
        run_from_settings,
    )
    from video_annotator_tpu.camera import Camera, CameraModel

    cols, rows = 7, 5
    true_cam = Camera.make(
        300.0, 300.0, 320.0, 240.0, 640, 480, CameraModel.FISHEYE,
        dist=jnp.asarray([0.02, -0.005, 0.0, 0.0], jnp.float32),
    )
    obj = board_object_points(cols, rows, 1.0, PatternType.CIRCLES_GRID)
    center = obj.mean(0)
    rng = np.random.default_rng(3)
    poses = []
    for _ in range(10):
        R = np.asarray(so3.exp(jnp.asarray(
            rng.normal(size=3) * np.array([0.15, 0.15, 0.05]), jnp.float32)))
        t = np.array([
            rng.uniform(-0.8, 0.8) - center[0],
            rng.uniform(-0.8, 0.8) - center[1],
            rng.uniform(11.0, 15.0),
        ])
        poses.append((R, t))
    frames = _render_circle_frames(true_cam, poses, obj)
    names = []
    for i, f in enumerate(frames):
        name = f"view{i:02d}.png"
        cv2.imwrite(str(tmp_path / name), f)
        names.append(name)

    fs = cv2.FileStorage(str(tmp_path / "images.xml"),
                         cv2.FILE_STORAGE_WRITE)
    fs.startWriteStruct("images", cv2.FileNode_SEQ)
    for n in names:
        fs.write("", n)
    fs.endWriteStruct()
    fs.release()

    settings = tmp_path / "settings.xml"
    settings.write_text(f"""<?xml version="1.0"?>
<opencv_storage>
<Settings>
  <BoardSize_Width>{cols}</BoardSize_Width>
  <BoardSize_Height>{rows}</BoardSize_Height>
  <Square_Size>1</Square_Size>
  <Calibrate_Pattern>"CIRCLES_GRID"</Calibrate_Pattern>
  <Input>"images.xml"</Input>
  <Calibrate_NrOfFrameToUse>10</Calibrate_NrOfFrameToUse>
  <Calibrate_UseFisheyeModel>1</Calibrate_UseFisheyeModel>
  <Write_outputFileName>"out_camera_data.xml"</Write_outputFileName>
  <Write_DetectedFeaturePoints>1</Write_DetectedFeaturePoints>
  <Write_gridPoints>1</Write_gridPoints>
</Settings>
</opencv_storage>
""")
    cam, rms = run_from_settings(str(settings))
    assert rms < 1.0, rms
    assert abs(float(cam.fx) - 300.0) < 6.0, float(cam.fx)

    # Output is valid FileStorage with the reference's field names.
    out = cv2.FileStorage(str(tmp_path / "out_camera_data.xml"),
                          cv2.FILE_STORAGE_READ)
    k = out.getNode("camera_matrix").mat()
    d = out.getNode("distortion_coefficients").mat()
    err = out.getNode("avg_reprojection_error").real()
    assert k.shape == (3, 3) and abs(k[0, 0] - float(cam.fx)) < 1e-3
    assert d.shape[0] == 4
    assert err == rms
    assert out.getNode("image_width").real() == 640
    assert not out.getNode("image_points").empty()
    assert not out.getNode("grid_points").empty()
    out.release()


def test_calibrate_fix_flags():
    """CALIB_FIX_* parity: fixed parameters stay exactly at their pinned
    values while the fit still converges on the free ones."""
    import jax.numpy as jnp

    from video_annotator_tpu.calibrate import _project, calibrate
    from video_annotator_tpu.camera import CameraModel

    w, h = 640, 480
    true = {
        "fx": jnp.float32(301.0),
        "fy": jnp.float32(301.0),
        "cx": jnp.float32((w - 1) / 2.0),   # truth AT center: fixing is exact
        "cy": jnp.float32((h - 1) / 2.0),
        "dist": jnp.asarray([0.0, -0.01, 0.0, 0.0], jnp.float32),
    }
    xs, ys = np.meshgrid(np.arange(9), np.arange(6))
    obj = np.stack([xs.ravel() - 4, ys.ravel() - 2.5, np.zeros(54)], axis=1)
    img = _synthetic_views(true, obj, n_views=12, model=CameraModel.FISHEYE,
                           seed=5)

    cam, rms = calibrate(
        obj, img, (w, h), CameraModel.FISHEYE, steps=2500,
        fix_aspect_ratio=1.0,          # fx == fy exactly
        fix_principal_point=True,      # (cx, cy) pinned at center
        fix_k=(True, False, True, True),  # k1/k3/k4 pinned at zero
    )
    assert rms < 0.5, rms
    assert float(cam.fx) == float(cam.fy)
    assert float(cam.cx) == (w - 1) / 2.0
    assert float(cam.cy) == (h - 1) / 2.0
    d = np.asarray(cam.dist)
    assert d[0] == 0.0 and d[2] == 0.0 and d[3] == 0.0
    assert abs(d[1] + 0.01) < 5e-3, d
    assert abs(float(cam.fx) - 301.0) < 3.0, float(cam.fx)


def test_standard_model_fits_radial_distortion():
    """Calibrate_UseFisheyeModel=0 (the reference's standard model) must
    FIT radial distortion, not silently pin it at zero: recover a known
    Brown k1/k2 from synthetic rectilinear views. Views are posed so all
    detections land INSIDE the image (as real detections must — the
    pinhole model extrapolates unboundedly outside it)."""
    import jax.numpy as jnp

    from video_annotator_tpu.calibrate import _project, calibrate
    from video_annotator_tpu.camera import CameraModel

    w, h = 640, 480
    true = {
        "fx": jnp.float32(400.0),
        "fy": jnp.float32(402.0),
        "cx": jnp.float32(319.0),
        "cy": jnp.float32(241.0),
        "dist": jnp.asarray([-0.25, 0.08, 0.0, 0.0], jnp.float32),
    }
    xs, ys = np.meshgrid(np.arange(9), np.arange(6))
    obj = np.stack([xs.ravel() - 4, ys.ravel() - 2.5, np.zeros(54)], axis=1)
    rng = np.random.default_rng(2)
    n_views = 12
    params = dict(true)
    params["rvec"] = jnp.asarray(rng.normal(size=(n_views, 3)) * 0.25,
                                 jnp.float32)
    params["tvec"] = jnp.asarray(np.stack([
        rng.normal(size=n_views) * 0.4,
        rng.normal(size=n_views) * 0.4,
        9.0 + 3.0 * rng.uniform(size=n_views),
    ], axis=1), jnp.float32)
    img = np.asarray(_project(params, jnp.asarray(obj, jnp.float32),
                              CameraModel.RECTILINEAR))
    img = img + np.random.default_rng(1).normal(size=img.shape) * 0.05
    assert ((img[..., 0] >= 0) & (img[..., 0] < w)
            & (img[..., 1] >= 0) & (img[..., 1] < h)).all()

    cam, rms = calibrate(obj, img, (w, h),
                         CameraModel.RECTILINEAR, steps=3000)
    assert rms < 0.5, rms
    assert abs(float(cam.fx) - 400.0) < 4.0, float(cam.fx)
    d = np.asarray(cam.dist)
    assert abs(d[0] + 0.25) < 0.03, d
    assert abs(d[1] - 0.08) < 0.05, d


def test_run_from_settings_writes_extrinsics(tmp_path):
    """Write_extrinsicParameters=1 emits the (V, 6) [rvec|tvec] matrix
    the reference's saveCameraParams writes
    (camera_calibration.cpp:640-668)."""
    import cv2
    import jax.numpy as jnp

    from video_annotator_tpu.calibrate import (
        PatternType,
        board_object_points,
        run_from_settings,
    )
    from video_annotator_tpu.camera import Camera, CameraModel

    cols, rows = 7, 5
    true_cam = Camera.make(
        300.0, 300.0, 320.0, 240.0, 640, 480, CameraModel.FISHEYE,
        dist=jnp.asarray([0.02, -0.005, 0.0, 0.0], jnp.float32),
    )
    obj = board_object_points(cols, rows, 1.0, PatternType.CIRCLES_GRID)
    center = obj.mean(0)
    rng = np.random.default_rng(9)
    poses = []
    for _ in range(8):
        R = np.asarray(so3.exp(jnp.asarray(
            rng.normal(size=3) * np.array([0.15, 0.15, 0.05]), jnp.float32)))
        t = np.array([
            rng.uniform(-0.8, 0.8) - center[0],
            rng.uniform(-0.8, 0.8) - center[1],
            rng.uniform(11.0, 15.0),
        ])
        poses.append((R, t))
    frames = _render_circle_frames(true_cam, poses, obj)
    names = []
    for i, f in enumerate(frames):
        name = f"v{i:02d}.png"
        cv2.imwrite(str(tmp_path / name), f)
        names.append(name)
    fs = cv2.FileStorage(str(tmp_path / "images.xml"), cv2.FILE_STORAGE_WRITE)
    fs.startWriteStruct("images", cv2.FileNode_SEQ)
    for n in names:
        fs.write("", n)
    fs.endWriteStruct()
    fs.release()
    (tmp_path / "settings.xml").write_text(f"""<?xml version="1.0"?>
<opencv_storage>
<Settings>
  <BoardSize_Width>{cols}</BoardSize_Width>
  <BoardSize_Height>{rows}</BoardSize_Height>
  <Square_Size>1</Square_Size>
  <Calibrate_Pattern>"CIRCLES_GRID"</Calibrate_Pattern>
  <Input>"images.xml"</Input>
  <Calibrate_NrOfFrameToUse>8</Calibrate_NrOfFrameToUse>
  <Calibrate_UseFisheyeModel>1</Calibrate_UseFisheyeModel>
  <Write_outputFileName>"out.xml"</Write_outputFileName>
  <Write_extrinsicParameters>1</Write_extrinsicParameters>
  <Show_UndistortedImage>1</Show_UndistortedImage>
</Settings>
</opencv_storage>
""")
    cam, rms = run_from_settings(str(tmp_path / "settings.xml"))
    out = cv2.FileStorage(str(tmp_path / "out.xml"), cv2.FILE_STORAGE_READ)
    extr = out.getNode("extrinsic_parameters").mat()
    out.release()
    assert extr is not None and extr.shape == (8, 6), extr
    # Translations should be near the synthetic depths (z ~ 11-15).
    assert np.all(extr[:, 5] > 5.0) and np.all(extr[:, 5] < 25.0), extr[:, 5]
    # Show_UndistortedImage=1 (the reference's post-fit view switch)
    # produces the headless PNG dump next to the output FileStorage.
    undist = tmp_path / "out.xml.undistorted"
    assert (undist / "undistorted_000.png").exists(), list(tmp_path.iterdir())


def test_live_camera_input_absent_device_errors_cleanly():
    """Numeric calibration input is the reference's live-camera branch
    (``camera_calibration.cpp:108-113``); on a host with no such
    capture device it must raise a clean ValueError naming the device,
    not crash or hang."""
    from video_annotator_tpu.calibrate import _iter_gray_frames

    with pytest.raises(ValueError, match="capture device"):
        next(_iter_gray_frames("93"))


def test_show_undistorted_writes_views(tmp_path):
    """``--show-undistorted`` renders sampled frames through the fitted
    camera with this framework's own warp (the reference's
    ``Show_UndistortedImage``, ``camera_calibration.cpp:707-720``) and
    must work headless (PNG dump, no GUI required)."""
    import cv2

    from video_annotator_tpu.calibrate import show_undistorted
    from video_annotator_tpu.camera import Camera

    cam = Camera.make(40.0, 40.0, 47.5, 35.5, 96, 72,
                      CameraModel.FISHEYE)
    n = show_undistorted(cam, "synthetic://shaky?w=96&h=72&n=3",
                         str(tmp_path), max_frames=2, interval_s=0.0)
    assert n == 2
    img = cv2.imread(str(tmp_path / "undistorted_000.png"),
                     cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.size > 0


def test_live_camera_bounded_capture_ends_cleanly(monkeypatch):
    """When the bounded live capture exhausts its frame budget (board
    never found), iteration must END — not fall through to the video
    file reader with the numeric ID as a filename."""
    import video_annotator_tpu.calibrate as C

    class _FakeCap:
        def __init__(self, _id):
            self._n = 0

        def isOpened(self):
            return True

        def get(self, _prop):
            return 30.0

        def read(self):
            self._n += 1
            return True, np.full((24, 32, 3), 127, np.uint8)

        def release(self):
            pass

    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", _FakeCap)
    monkeypatch.setattr(C, "_LIVE_CAPTURE_MAX_FRAMES", 4)
    frames = list(C._iter_gray_frames("0"))
    assert len(frames) == 4
    assert frames[0][0].shape == (24, 32) and frames[0][2] == 30.0
