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

import os as _os

import jax as _jax

# Persistent executable cache: every CLI invocation is a fresh process and
# the big Pallas warp/LK kernels cost minutes of (remote) compile time.
# Harmless where the backend doesn't support serialization. Opt out with
# VAT_NO_COMPILE_CACHE=1.
if not _os.environ.get("VAT_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "vat_jax"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from video_annotator_tpu.camera import (  # noqa: F401
    Camera,
    CameraModel,
    CameraPreset,
    get_output_camera,
    get_preset_camera,
)
