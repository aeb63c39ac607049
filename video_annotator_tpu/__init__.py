"""video_annotator_tpu — a TPU-native (JAX/XLA/Pallas) video stabilization framework.

A ground-up rebuild of the capabilities of ``hedgepigdaniel/video-annotator``
(fisheye action-camera stabilization + reprojection) designed for TPU:

- ``camera`` / ``so3``: pure-JAX camera models (rectilinear + equidistant
  fisheye) and SO(3) utilities (the math inside the reference's
  ``opencv/createMap.cl`` and ``opencv/FrameSourceWarp.cpp``).
- ``ops``: compute kernels — fused map-generation + bilinear-remap warp
  (Pallas with an XLA fallback), Shi-Tomasi corners, pyramidal Lucas-Kanade
  optical flow, batched rotation RANSAC.
- ``smoothing``: Savitzky-Golay on SO(3), Kalman, and GPMF-gyro-driven
  trajectory filters as ``lax.scan``-able transforms.
- ``models``: stabilizer families mirroring the reference's filter choices
  (``dewobble``-style SO(3) rotation stabilizer — the flagship — plus 2D
  similarity/``vidstab``-style and block-matching ``deshake``-style).
- ``io``: host-side decode/encode front-ends (OpenCV-FFmpeg, Y4M, raw NV12),
  GoPro segment join, GPMF metadata parsing, double-buffered device feed.
- ``pipeline``: two-phase analyse/encode rendering, trajectory persistence
  (the ``.trf`` analogue), comparison grids, per-stage profiler.
- ``parallel``: device-mesh sharding — data-parallel over streams, spatial
  sharding of the warp grid, temporal sharding with smoother halos.
"""

__version__ = "0.1.0"

from video_annotator_tpu.camera import (  # noqa: F401
    Camera,
    CameraModel,
    CameraPreset,
    get_output_camera,
    get_preset_camera,
)
