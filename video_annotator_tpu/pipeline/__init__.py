"""Streaming pipeline: two-phase analyse/encode, trajectory store, profiler."""

from video_annotator_tpu.pipeline.profiler import StageProfiler  # noqa: F401
from video_annotator_tpu.pipeline.trajectory import Trajectory  # noqa: F401
from video_annotator_tpu.pipeline.render import RenderOptions, render  # noqa: F401
