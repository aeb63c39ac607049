"""GoPro chaptered-file discovery and joining.

Reimplements the reference's ``join`` command (``src/join.ts``): GoPro
splits recordings into ``GOPR<code>.MP4`` + ``GP01<code>.MP4``,
``GP02<code>.MP4``, ... (discovery loop at ``src/join.ts:8-34``); the
reference concatenates them with ffmpeg's concat demuxer, stream-copying
video, audio, and the GPMF metadata track (identified by handler name
``"\\tGoPro MET"``, ``src/join.ts:56-58``).

Join paths, best first:
1. an ``ffmpeg`` binary (if present): lossless concat-demuxer stream copy
   incl. the GPMF data track;
2. ``.y4m`` sources: lossless raw concatenation;
3. otherwise: decode + re-encode through OpenCV (lossy; a warning is
   printed) — GPMF can still be extracted separately via ``io/mp4.py``.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List


def find_source_segments(code: str, directory: str = ".") -> List[str]:
    """Ordered chapter files for a recording code (``src/join.ts:8-34``)."""
    exts = (".MP4", ".mp4", ".y4m")
    first = ext = None
    for e in exts:
        cand = os.path.join(directory, f"GOPR{code}{e}")
        if os.path.exists(cand):
            first, ext = cand, e
            break
    if first is None:
        raise FileNotFoundError(
            f"no segments found for code {code!r} in {directory!r}"
        )
    segments = [first]
    i = 1
    while True:
        nxt = os.path.join(directory, f"GP{i:02d}{code}{ext}")
        if not os.path.exists(nxt):
            break
        segments.append(nxt)
        i += 1
    return segments


def count_frames(path: str) -> int:
    """Total frame count for progress reporting (``src/join.ts:36-41``)."""
    from video_annotator_tpu.io.video import open_reader

    r = open_reader(path)
    n = r.meta.num_frames
    r.close()
    if n:
        return n
    r = open_reader(path)
    n = sum(1 for _ in r)
    r.close()
    return n


def _join_ffmpeg(segments: List[str], output: str) -> None:
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for s in segments:
            f.write(f"file '{os.path.abspath(s)}'\n")
        listfile = f.name
    try:
        # Map video, audio and the GPMF data track (src/join.ts:59-82).
        subprocess.run(
            [
                "ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", listfile,
                "-map", "0:v?", "-map", "0:a?", "-map", "0:d?",
                "-c", "copy", output,
            ],
            check=True,
            capture_output=True,
        )
    finally:
        os.unlink(listfile)


def _join_decode_encode(segments: List[str], output: str) -> None:
    """Decode every segment's frames into one writer (shared by the y4m
    and last-resort re-encode paths)."""
    from video_annotator_tpu.io.video import open_reader, open_writer

    first = open_reader(segments[0])
    writer = open_writer(output, first.meta)
    try:
        for y, u, v in first:
            writer.write((y, u, v))
        first.close()
        for seg in segments[1:]:
            r = open_reader(seg)
            try:
                for y, u, v in r:
                    writer.write((y, u, v))
            finally:
                r.close()
    finally:
        writer.close()


def _join_y4m(segments: List[str], output: str) -> None:
    _join_decode_encode(segments, output)


def _join_reencode(segments: List[str], output: str) -> None:
    print(
        "warning: no ffmpeg binary for lossless stream copy; re-encoding "
        "through OpenCV"
    )
    _join_decode_encode(segments, output)


def join(code: str, output: str, directory: str = ".") -> None:
    """Join the segments of a recording into a single file.

    Preference order: native libav stream copy (lossless, keeps audio +
    GPMF — ``src/join.ts:59-82``), ffmpeg binary concat, y4m raw concat,
    cv2 re-encode as last resort."""
    segments = find_source_segments(code, directory)
    if not output.endswith(".y4m") and not all(
        s.endswith(".y4m") for s in segments
    ):
        try:
            from video_annotator_tpu.io.native import (
                native_concat,
                native_concat_available,
            )

            if native_concat_available():
                native_concat(segments, output)
                return
        except (RuntimeError, OSError) as e:
            print(f"warning: native concat failed ({e}); falling back")
    if shutil.which("ffmpeg") and not output.endswith(".y4m"):
        _join_ffmpeg(segments, output)
    elif all(s.endswith(".y4m") for s in segments) or output.endswith(".y4m"):
        _join_y4m(segments, output)
    else:
        _join_reencode(segments, output)
