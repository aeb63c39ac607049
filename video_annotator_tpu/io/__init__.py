"""Host-side IO: decode/encode front-ends, GoPro segments, GPMF metadata."""

from video_annotator_tpu.io.video import (  # noqa: F401
    VideoMeta,
    open_reader,
    open_writer,
)
from video_annotator_tpu.io.synthetic import SyntheticCamera  # noqa: F401
