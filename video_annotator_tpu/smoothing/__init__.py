"""Camera-trajectory smoothing: Savitzky-Golay on SO(3), Kalman, gyro."""

from video_annotator_tpu.smoothing.savgol import (  # noqa: F401
    savgol_weights,
    smooth_rotations,
)
from video_annotator_tpu.smoothing.kalman import kalman_filter_1d, smooth_rotations_kalman  # noqa: F401
from video_annotator_tpu.smoothing.gyro import integrate_gyro  # noqa: F401
